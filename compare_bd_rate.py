"""BD-rate comparison vs anchors — the role of the reference
compare_bd_rate.py: loads {name: result-json} produced by test_video.py,
aggregates per rate-point over sequences, computes Bjøntegaard BD-rate per
class (or sequence) per frame type against an anchor method, prints a
table, and optionally plots RD curves.

Anchor JSONs (e.g. the VTM-17.0 low-delay anchor) use the same schema as
test_video.py outputs; point --log_paths at any such file.
"""

import argparse
import json
import os
import sys

import numpy as np

from dcvc_tpu.utils.bd_metric import bd_rate


def parse_args(argv):
    parser = argparse.ArgumentParser()
    parser.add_argument("--compare_between", type=str, default="class",
                        choices=["class", "sequence"])
    parser.add_argument("--compare_frame_type", type=str, default="default",
                        choices=["default", "all"])
    parser.add_argument("--base_method", type=str, required=True)
    parser.add_argument("--log_paths", type=str, required=True, nargs="+",
                        help="pairs: name path name path ...")
    parser.add_argument("--output_path", type=str, default="stdout")
    parser.add_argument("--plot_path", type=str, default="")
    parser.add_argument("--allow_extrapolation", action="store_true",
                        help="BD-rate over the union distortion range "
                             "when curves do not overlap (labeled, "
                             "out-of-spec; for untrained sanity runs)")
    parser.add_argument("--distortion_metrics", type=str, nargs="+",
                        default=["psnr"],
                        choices=["psnr", "msssim", "psnr_y", "psnr_u",
                                 "psnr_v", "msssim_y", "msssim_u", "msssim_v"])
    return parser.parse_args(argv)


def mean_over_sequence(res, metric):
    """Average each rate point over the sequences of a class, weighted by
    frame counts (reference mean_over_rate_point/mean_over_sequence)."""
    out = {}
    for method, classes in res.items():
        out[method] = {}
        for ds_name, seqs in classes.items():
            rate_points = {}
            for seq_results in seqs.values():
                for rp, v in seq_results.items():
                    rate_points.setdefault(rp, []).append(v)
            out[method][ds_name] = {
                rp: _mean_point(vals, metric)
                for rp, vals in sorted(rate_points.items())}
    return out


def _mean_point(vals, metric):
    agg = {}
    for ft in ("i", "p", "all"):
        bpp = dist = n = 0.0
        for v in vals:
            if ft == "i":
                num = v["i_frame_num"]
            elif ft == "p":
                num = v["p_frame_num"]
            else:
                num = v["i_frame_num"] + v["p_frame_num"]
            bpp += v[f"ave_{ft}_frame_bpp"] * num
            dist += v[f"ave_{ft}_frame_{metric}"] * num
            n += num
        n = max(n, 1)
        agg[f"ave_{ft}_frame_bpp"] = bpp / n
        agg[f"ave_{ft}_frame_{metric}"] = dist / n
    return agg


def compute_bd_rates(data, base, metric, frame_type,
                     allow_extrapolation=False):
    """data: method -> class -> rate_point -> means."""
    results = {}
    for method, classes in data.items():
        if method == base:
            continue
        results[method] = {}
        for ds_name, points in classes.items():
            if ds_name not in data[base]:
                continue
            def curve(m):
                pts = data[m][ds_name]
                bpp = [p[f"ave_{frame_type}_frame_bpp"] for p in pts.values()]
                dist = [p[f"ave_{frame_type}_frame_{metric}"]
                        for p in pts.values()]
                return bpp, dist
            bpp_a, dist_a = curve(base)
            bpp_t, dist_t = curve(method)
            if (len(bpp_t) >= 3 and bpp_a[0] > 0 and dist_t[0]
                    and dist_t[0] > 0):
                results[method][ds_name] = bd_rate(
                    bpp_a, dist_a, bpp_t, dist_t,
                    extrapolate=allow_extrapolation)
    return results


def print_table(results, title):
    ds_names = sorted({d for m in results.values() for d in m})
    methods = sorted(results)
    if not ds_names:
        return
    col = max([len(d) for d in ds_names] + [12])
    header = "method".ljust(24) + "".join(d.rjust(col + 2) for d in ds_names) \
        + "    average".rjust(col)
    print(f"\n== BD-rate (%) vs anchor — {title} ==")
    print(header)
    for m in methods:
        row = m.ljust(24)
        vals = []
        for d in ds_names:
            v = results[m].get(d)
            row += (f"{v:+.2f}".rjust(col + 2) if v is not None
                    else "-".rjust(col + 2))
            if v is not None and np.isfinite(v):
                vals.append(v)
        avg = np.mean(vals) if vals else float("nan")
        row += f"{avg:+.2f}".rjust(col)
        print(row)


def plot_rd_curves(data, metric, frame_type, plot_path):
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt
    os.makedirs(plot_path, exist_ok=True)
    ds_names = sorted({d for m in data.values() for d in m})
    for ds_name in ds_names:
        plt.figure()
        for method, classes in data.items():
            if ds_name not in classes:
                continue
            pts = classes[ds_name]
            bpp = [p[f"ave_{frame_type}_frame_bpp"] for p in pts.values()]
            dist = [p[f"ave_{frame_type}_frame_{metric}"]
                    for p in pts.values()]
            order = np.argsort(bpp)
            bpp = np.asarray(bpp)[order]
            dist = np.asarray(dist)[order]
            plt.plot(bpp, dist, marker="o", label=method)
        plt.grid(True)
        plt.xlabel("bpp")
        plt.ylabel(metric)
        plt.title(ds_name)
        plt.legend(loc="lower right")
        plt.savefig(os.path.join(plot_path,
                                 f"rd_{metric}_{frame_type}_{ds_name}.png"))
        plt.close("all")


def main(argv):
    args = parse_args(argv)
    assert len(args.log_paths) % 2 == 0, "--log_paths takes name path pairs"
    raw = {}
    for i in range(0, len(args.log_paths), 2):
        name, path = args.log_paths[i], args.log_paths[i + 1]
        with open(path) as f:
            raw[name] = json.load(f)
    assert args.base_method in raw, f"anchor {args.base_method} not in logs"

    if args.compare_between == "sequence":
        flat = {}
        for m, classes in raw.items():
            flat[m] = {}
            for ds, seqs in classes.items():
                for seq, v in seqs.items():
                    flat[m][seq] = {"_": v} if "ave_all_frame_bpp" in v else v
        raw = flat

    frame_types = (["i", "p", "all"] if args.compare_frame_type == "default"
                   else ["all"])

    lines = []
    for metric in args.distortion_metrics:
        data = mean_over_sequence(raw, metric)
        for ft in frame_types:
            results = compute_bd_rates(data, args.base_method, metric, ft,
                                       args.allow_extrapolation)
            print_table(results, f"{metric}, {ft}-frames")
            if args.plot_path:
                plot_rd_curves(data, metric, ft, args.plot_path)

    if args.output_path != "stdout":
        # also persist the numeric results
        out = {}
        for metric in args.distortion_metrics:
            data = mean_over_sequence(raw, metric)
            out[metric] = {ft: compute_bd_rates(data, args.base_method,
                                                metric, ft,
                                                args.allow_extrapolation)
                           for ft in frame_types}
        with open(args.output_path, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main(sys.argv[1:])
