"""Persist hardware-measured two-level top-k winners into the
per-device-kind tuned store that the auto pickers consult
(`utils/autotune.py`). Unlike ``tune`` (which sweeps a synthetic
262k-row corpus), this banks winners measured at the OFFICIAL bench
shape (1.1M x 1024, B=1024) by `scripts/probe_g16_deepk.py` /
`probe_k100_bm.py`, so the driver's end-of-round `bench.py` runs the
same configs the probes proved fastest.

Usage: python scripts/persist_tuned_axon.py k1000=16,8,512 [k100=8,8,512]
       (each value is bin_size,super_size,tile_b for that depth)
Run on the live backend: the store file is keyed by device kind.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from codemix_dense_retrieval_tpu.utils.autotune import save_tuned, tune_file_path


def main() -> None:
    update = {}
    for arg in sys.argv[1:]:
        depth, vals = arg.split("=")
        g, m, tb = (int(v) for v in vals.split(","))
        knum = int(depth.lstrip("k"))
        update[f"topk.bin_size.k{knum}"] = g
        update[f"topk.super_size.k{knum}"] = m
        update[f"topk.tile_b.k{knum}"] = tb
    if not update:
        print("nothing to persist", file=sys.stderr)
        sys.exit(2)
    update["_source"] = "probe_g16_deepk (1.1M x 1024, B=1024, hardware)"
    path = save_tuned(update)
    print(f"wrote {path}")
    with open(path) as f:
        print(f.read())
    assert path == tune_file_path()


if __name__ == "__main__":
    main()
