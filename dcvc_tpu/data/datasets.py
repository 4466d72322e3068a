"""Training datasets (reference src/datasets/image_dataset.py,
video_dataset.py): description.json-driven folders, random crop/flip/pad,
RGB -> YCbCr - 0.5, random QP with its matching lambda per sample.

TPU-first notes: samples are NHWC float32 numpy; BatchLoader is a simple
prefetching host-side loader (thread pool) feeding jnp batches sharded
over the mesh's data axis — the role of torch DataLoader + pin_memory +
DistributedSampler in the reference (utils/common.py:137-154).
"""

import json
import os
import queue
import threading

import numpy as np

from ..core.color import rgb2ycbcr_np


def _load_rgb(path):
    from PIL import Image
    return Image.open(path).convert("RGB")


def _crop_pad_to_patch(img_u8, patch_h, patch_w, rng):
    """Random crop with constant padding for small images."""
    h, w = img_u8.shape[:2]
    pad_h = max(0, patch_h - h)
    pad_w = max(0, patch_w - w)
    if pad_h or pad_w:
        img_u8 = np.pad(img_u8, ((pad_h // 2, pad_h - pad_h // 2),
                                 (pad_w // 2, pad_w - pad_w // 2), (0, 0)),
                        mode="constant")
    y = rng.integers(0, img_u8.shape[0] - patch_h + 1)
    x = rng.integers(0, img_u8.shape[1] - patch_w + 1)
    return img_u8[y:y + patch_h, x:x + patch_w]


def _to_ycbcr_centered(img_u8):
    img = img_u8.astype(np.float32) / 255.0
    return (rgb2ycbcr_np(img) - 0.5).astype(np.float32)


class ImageFolder:
    """description.json = list of image paths relative to the root.

    raw_rgb=True returns uint8 RGB patches (color conversion moves into
    the jitted train step): 4x less host->device traffic, which matters
    on tunneled/low-bandwidth device links."""

    def __init__(self, root, patch_h, patch_w, qp_num, lambdas, seed=0,
                 raw_rgb=False):
        self.root = root
        with open(os.path.join(root, "description.json")) as f:
            self.items = json.load(f)
        self.patch_h = patch_h
        self.patch_w = patch_w
        self.qp_num = qp_num
        self.lambdas = np.asarray(lambdas, np.float32)
        self.rng = np.random.default_rng(seed)
        self.raw_rgb = raw_rgb
        self._rng_lock = threading.Lock()

    def __len__(self):
        return len(self.items)

    def set_patch_size(self, patch_w, patch_h):
        self.patch_w, self.patch_h = patch_w, patch_h

    def __getitem__(self, index):
        with self._rng_lock:
            flip = self.rng.random() < 0.5
            fy = self.rng.integers(0, 1 << 30)
            fx = self.rng.integers(0, 1 << 30)
            qp = int(self.rng.integers(0, self.qp_num))
        img = _load_rgb(os.path.join(self.root, self.items[index]))
        if flip:
            img = img.transpose(0)  # PIL FLIP_LEFT_RIGHT
        img = np.asarray(img, np.uint8)
        h, w = img.shape[:2]
        pad_h = max(0, self.patch_h - h)
        pad_w = max(0, self.patch_w - w)
        if pad_h or pad_w:
            img = np.pad(img, ((pad_h // 2, pad_h - pad_h // 2),
                               (pad_w // 2, pad_w - pad_w // 2), (0, 0)),
                         mode="constant")
        y = int(fy % (img.shape[0] - self.patch_h + 1))
        x = int(fx % (img.shape[1] - self.patch_w + 1))
        img = img[y:y + self.patch_h, x:x + self.patch_w]
        x_out = img if self.raw_rgb else _to_ycbcr_centered(img)
        qp = int(qp)
        return {"x": x_out, "qp": np.int32(qp),
                "lambda": np.float32(self.lambdas[qp])}


class VideoFolder:
    """description.json = {seqs: [{path, height, width, seq_length}],
    frames: [frame file names]}.  Returns the first frame plus
    (frame_num-1)/gop groups of gop frames concatenated on channels
    (reference video_dataset.py:33-105)."""

    def __init__(self, root, patch_h, patch_w, qp_num, lambdas,
                 frame_num=5, group_of_pictures=1, seed=0, raw_rgb=False,
                 cache=False):
        self.root = root
        with open(os.path.join(root, "description.json")) as f:
            desc = json.load(f)
        self.seqs = desc["seqs"]
        self.frames = desc["frames"]
        self.patch_h = patch_h
        self.patch_w = patch_w
        self.qp_num = qp_num
        self.lambdas = np.asarray(lambdas, np.float32)
        self.frame_num = frame_num
        self.gop = group_of_pictures
        self.rng = np.random.default_rng(seed)
        self.raw_rgb = raw_rgb
        # in-memory decoded-frame cache: PNG decode dominates step time
        # for long-rollout video training (frame_num x batch reads per
        # step); the reference instead pays this in its DataLoader
        # worker pool (video_dataset.py).  uint8 full frames, so a
        # 48x65-frame 384px corpus is ~1.4 GB.
        self._cache = {} if cache else None
        self._rng_lock = threading.Lock()

    def __len__(self):
        return len(self.seqs)

    def set_frame_num(self, frame_num):
        self.frame_num = frame_num

    def set_patch_size(self, patch_w, patch_h):
        self.patch_w, self.patch_h = patch_w, patch_h

    def _frame_indexes(self, seq_length):
        if self.frame_num < seq_length:
            start = int(self.rng.integers(0, seq_length - self.frame_num))
            return list(range(start, start + self.frame_num))
        # ping-pong padding for short sequences
        idx, i, inc = [], 0, True
        while len(idx) < self.frame_num:
            idx.append(i)
            if inc:
                if i == seq_length - 1:
                    i, inc = i - 1, False
                else:
                    i += 1
            else:
                if i == 0:
                    i, inc = 1, True
                else:
                    i -= 1
        return idx

    def __getitem__(self, index):
        seq = self.seqs[index]
        h, w = seq["height"], seq["width"]
        pad_h, pad_w = max(0, self.patch_h - h), max(0, self.patch_w - w)
        # all randomness drawn up front under a lock so BatchLoader's
        # worker threads can load/crop in parallel safely
        with self._rng_lock:
            idxs = self._frame_indexes(seq["seq_length"])
            flip = self.rng.random() < 0.5
            y = int(self.rng.integers(0, h + pad_h - self.patch_h + 1))
            x = int(self.rng.integers(0, w + pad_w - self.patch_w + 1))
            qp = int(self.rng.integers(0, self.qp_num))

        def load_frame(i):
            if self._cache is not None:
                key = (seq["path"], i)
                img = self._cache.get(key)
                if img is None:
                    img = np.asarray(_load_rgb(os.path.join(
                        self.root, seq["path"], self.frames[i])), np.uint8)
                    self._cache[key] = img
                if flip:
                    img = img[:, ::-1]
            else:
                img = _load_rgb(os.path.join(self.root, seq["path"],
                                             self.frames[i]))
                if flip:
                    img = img.transpose(0)
                img = np.asarray(img, np.uint8)
            if pad_h or pad_w:
                img = np.pad(img, ((pad_h // 2, pad_h - pad_h // 2),
                                   (pad_w // 2, pad_w - pad_w // 2), (0, 0)),
                             mode="constant")
            img = img[y:y + self.patch_h, x:x + self.patch_w]
            return img if self.raw_rgb else _to_ycbcr_centered(img)

        frames = [load_frame(i) for i in idxs]
        # first frame alone (the intra seed), then GOP-of-gop groups
        # concatenated along channels
        data = [frames[0]]
        group = []
        for f in frames[1:]:
            group.append(f)
            if len(group) == self.gop:
                data.append(np.concatenate(group, axis=-1))
                group = []

        return {"frames": data, "qp": np.int32(qp),
                "lambda": np.float32(self.lambdas[qp])}


class BatchLoader:
    """Background-threaded batcher: stacks dataset samples into NHWC
    numpy batches with prefetch (pin_memory/prefetch_factor equivalent)."""

    def __init__(self, dataset, batch_size, shuffle=True, prefetch=2, seed=0,
                 drop_last=True, repeats=1, workers=4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last
        self.repeats = repeats   # passes over the data per epoch (each
        # pass re-crops/re-flips, so small corpora still yield fresh
        # samples; keeps the lr schedule's epoch granularity meaningful)
        self.workers = max(1, int(workers))  # sample-loading thread pool
        # (the reference DataLoader num_workers role; PIL/numpy release
        # the GIL so threads scale for decode+crop work)

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n * self.repeats

    def __iter__(self):
        order = np.concatenate([
            self.rng.permutation(len(self.dataset)) if self.shuffle
            else np.arange(len(self.dataset))
            for _ in range(self.repeats)])
        q = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                _produce()
            except Exception:  # consumer gone (early break/shutdown)
                pass
            q.put(sentinel)

        def _produce():
            from collections import deque
            from concurrent.futures import ThreadPoolExecutor
            batch = []
            with ThreadPoolExecutor(self.workers) as ex:
                # windowed submission: keep ~2 batches of samples in
                # flight (ex.map would eagerly schedule the whole epoch
                # and hold every decoded sample in memory)
                idx_iter = iter(order)
                futs = deque()

                def submit():
                    for i in idx_iter:
                        futs.append(ex.submit(self.dataset.__getitem__,
                                              int(i)))
                        return
                for _ in range(max(self.workers, self.batch_size) * 2):
                    submit()
                while futs:
                    batch.append(futs.popleft().result())
                    submit()
                    if len(batch) == self.batch_size:
                        q.put(self._collate(batch))
                        batch = []
            if batch and not self.drop_last:
                q.put(self._collate(batch))

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item

    @staticmethod
    def _collate(samples):
        out = {}
        for key in samples[0]:
            vals = [s[key] for s in samples]
            if isinstance(vals[0], list):  # list of frame groups
                out[key] = [np.stack([v[i] for v in vals])
                            for i in range(len(vals[0]))]
            else:
                out[key] = np.stack(vals)
        return out
