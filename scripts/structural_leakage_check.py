#!/usr/bin/env python
"""Remove train-set structures structurally similar to the test set.

Pairwise TM-align between every train/test PDB pair; training structures
with TM-score above the threshold to ANY test structure are deleted
(train/test leakage control, reference: data/tmalign_similarity_check.py).
Requires the TMalign binary.
"""
from __future__ import annotations

import argparse
import concurrent.futures as futures
import re
import subprocess
from pathlib import Path


def tm_score(tmalign: str, a: Path, b: Path) -> float:
    try:
        out = subprocess.run([tmalign, str(a), str(b)], capture_output=True,
                             text=True, timeout=300).stdout
    except Exception:
        return 0.0
    scores = [float(m) for m in re.findall(r"TM-score=\s*([0-9.]+)", out)]
    return max(scores) if scores else 0.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train_dir", required=True)
    p.add_argument("--test_dir", required=True)
    p.add_argument("--tmalign", default="TMalign")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--dry_run", action="store_true")
    args = p.parse_args()

    train = sorted(Path(args.train_dir).glob("*.pdb"))
    test = sorted(Path(args.test_dir).glob("*.pdb"))
    print(f"{len(train)} train vs {len(test)} test structures")

    def worst_score(t: Path) -> tuple[Path, float]:
        return t, max((tm_score(args.tmalign, t, q) for q in test), default=0.0)

    removed = 0
    with futures.ThreadPoolExecutor(args.workers) as ex:
        for t, s in ex.map(worst_score, train):
            if s > args.threshold:
                print(f"remove {t.name}: TM-score {s:.3f}")
                if not args.dry_run:
                    t.unlink()
                removed += 1
    print(f"removed {removed} leaking structures")


if __name__ == "__main__":
    main()
