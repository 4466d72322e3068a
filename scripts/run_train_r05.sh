#!/bin/bash
# Round-5 training pipeline on the attached chip: DMCI-small image
# model, then HTS-small video stages 0+1, checkpoints saved INSIDE the
# repo (checkpoints/) so the round snapshot commits them — the round-5
# VM restart wiped all previously-trained weights that lived outside
# the repo, which made the committed BD-gate artifact irreproducible.
# Schedules are the reference ones (train_image.py:19-33,
# train_video.py:21-94) with epoch lengths bounded to fit the session.
set -u
cd /root/repo
CKI=checkpoints/dmci_small_r05
CKP0=checkpoints/hts_small_r05_s0
CKP1=checkpoints/hts_small_r05_s1
mkdir -p "$CKI" "$CKP0" "$CKP1"

timeout "${T_IMG:-2400}" python train_image.py --model_size small \
    --train_dataset /root/data_synth/images --save_dir "$CKI" \
    --lambdas 10 2048 --batch_size 8 --data_repeat 1 -e 105 \
    --max_patch 384 --max_steps_per_epoch 24 > /tmp/train_i.log 2>&1
echo "image rc=$?"
if [ ! -f "$CKI/ckpt.bin" ]; then
  python scripts/status_to_ckpt.py "$CKI" "$CKI/ckpt.bin" \
      --config dmci_small >> /tmp/train_i.log 2>&1
fi

timeout "${T_VID0:-1800}" python train_video.py --model_structure hts \
    --model_size small --training_scheduling stage0 \
    --model_path_i "$CKI/ckpt.bin" \
    --train_dataset /root/data_synth/videos --save_dir "$CKP0" \
    --lambdas 1 768 --batch_size 4 --data_repeat 2 --device_data \
    --max_patch 256 --max_steps_per_epoch 60 > /tmp/train_p0.log 2>&1
echo "video stage0 rc=$?"
if [ ! -f "$CKP0/ckpt.bin" ]; then
  python scripts/status_to_ckpt.py "$CKP0" "$CKP0/ckpt.bin" \
      --config hts_small >> /tmp/train_p0.log 2>&1
fi

timeout "${T_VID1:-1500}" python train_video.py --model_structure hts \
    --model_size small --training_scheduling stage1 \
    --model_path_i "$CKI/ckpt.bin" --pretrain_path "$CKP0/ckpt.bin" \
    --train_dataset /root/data_synth/videos --save_dir "$CKP1" \
    --lambdas 1 768 --batch_size 4 --data_repeat 2 --device_data \
    --max_patch 256 --max_frame_num 17 \
    --max_steps_per_epoch 40 > /tmp/train_p1.log 2>&1
echo "video stage1 rc=$?"
if [ ! -f "$CKP1/ckpt.bin" ]; then
  python scripts/status_to_ckpt.py "$CKP1" "$CKP1/ckpt.bin" \
      --config hts_small >> /tmp/train_p1.log 2>&1
fi
echo "TRAIN PIPELINE DONE"
