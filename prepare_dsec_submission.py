"""DSEC-Flow public-benchmark submission formatter.

Same CLI surface and output layout as the reference formatter (reference
``prepare_dsec_submission.py:22-70``)::

    python prepare_dsec_submission.py <runid> [--path dsec_submissions/]
                                      [--eval_id N]

For every benchmark sequence folder produced by ``eval_flow.py`` (16-bit
``flow_bw`` PNGs), selects the frames flagged in ``<seq>_flag.npy`` (rolled
by -1 to fix prediction/GT alignment) and copies them into
``submission/<seq>/<file_index>.png`` using the benchmark's 6-digit indices
from ``<seq>.txt``.
"""

import argparse
import os
import shutil

import numpy as np


def retrieve_eval(args) -> str:
    eval_id = args.eval_id
    if args.eval_id < 0:
        eval_id = 0
        base = os.path.join(args.path, args.runid)
        for f in os.listdir(base):
            if f == ".DS_Store":
                continue
            try:
                tmp = int(f.split(".")[0].split("_")[-1])
            except ValueError:
                continue
            eval_id = max(eval_id, tmp + 1)
        eval_id -= 1
    path_from = os.path.join(args.path, args.runid, f"eval_{eval_id}")
    print(f"Preparing submission for eval_{eval_id}")
    return path_from


def prepare(args):
    path_from = retrieve_eval(args)
    entry = "flow_bw"

    for folder in sorted(os.listdir(path_from)):
        if folder in (".DS_Store", "submission"):
            continue
        flow_dir = os.path.join(path_from, folder, entry)
        if not os.path.isdir(flow_dir):
            continue

        indices = sorted(
            int(f.split(".")[0]) for f in os.listdir(flow_dir)
            if f.endswith(".png")
        )

        flags = np.load(os.path.join(args.path, folder + "_flag.npy"))
        flags = np.roll(flags, -1)

        ts_table = np.genfromtxt(
            os.path.join(args.path, folder + ".txt"),
            skip_header=1, delimiter=",",
        )
        file_indices = ts_table[:, -1]

        selected = [idx for i, idx in enumerate(indices) if flags[i] == 1]

        out_dir = os.path.join(path_from, "submission", folder)
        os.makedirs(out_dir, exist_ok=True)
        for i, idx in enumerate(selected):
            src = os.path.join(flow_dir, f"{idx:09d}.png")
            dst = os.path.join(
                out_dir, f"{int(file_indices[i]):06d}.png"
            )
            shutil.copy(src, dst)
        print(folder)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("runid")
    parser.add_argument("--path", default="dsec_submissions/")
    parser.add_argument("--eval_id", default=-1, type=int)
    prepare(parser.parse_args())
