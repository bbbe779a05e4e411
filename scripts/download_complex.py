#!/usr/bin/env python
"""Build the PackPPI-MSC pre-training corpus.

Pipeline (matching the reference corpus construction; reference:
data/download_complex.py): take the union of PDBbind-v2020 protein-protein
codes and 3Dcomplex QS40 representatives, remove every SKEMPI-v2 complex
and any entry sharing an ECOD homology group with a SKEMPI protein (leakage
control), then download the survivors from RCSB (PDB-REDO preferred when
available) with a thread pool.

Requires network access; inputs:
  --pdbbind_index  PDBbind PP INDEX file (plain text, codes in column 1)
  --qs40_list      3Dcomplex QS40 listing (one code per line)
  --skempi_csv     skempi_v2.csv (';'-separated, '#Pdb' column)
  --ecod_domains   ECOD domain description file (optional, for homology filter)
"""
from __future__ import annotations

import argparse
import concurrent.futures as futures
import csv
from pathlib import Path

RCSB_URL = "https://files.rcsb.org/download/{code}.pdb"
REDO_URL = "https://pdb-redo.eu/db/{code}/{code}_final.pdb"


def read_codes_pdbbind(path: str) -> set[str]:
    codes = set()
    for line in Path(path).read_text().splitlines():
        line = line.strip()
        if line and not line.startswith("#"):
            codes.add(line.split()[0].upper())
    return codes


def read_codes_qs40(path: str) -> set[str]:
    return {line.strip().split("_")[0].upper()
            for line in Path(path).read_text().splitlines() if line.strip()}


def read_skempi_codes(path: str) -> set[str]:
    codes = set()
    with open(path) as f:
        for row in csv.DictReader(f, delimiter=";"):
            codes.add(row["#Pdb"].split("_")[0].upper())
    return codes


def ecod_groups(path: str) -> dict[str, set[str]]:
    """pdb code -> set of ECOD homology group ids (f_id prefix x.y)."""
    groups: dict[str, set[str]] = {}
    for line in Path(path).read_text().splitlines():
        if line.startswith("#"):
            continue
        parts = line.split("\t")
        if len(parts) < 5:
            continue
        code = parts[4].upper() if len(parts[4]) == 4 else None
        fid = parts[3]
        if code:
            groups.setdefault(code, set()).add(".".join(fid.split(".")[:2]))
    return groups


def download_one(code: str, outdir: Path, prefer_redo: bool = True) -> bool:
    import requests

    out = outdir / f"{code.lower()}_rc.pdb"
    if out.exists():
        return True
    urls = [REDO_URL.format(code=code.lower()), RCSB_URL.format(code=code)] \
        if prefer_redo else [RCSB_URL.format(code=code)]
    for url in urls:
        try:
            r = requests.get(url, timeout=60)
            if r.ok and r.text.startswith(("HEADER", "ATOM", "REMARK")):
                out.write_text(r.text)
                return True
        except Exception:
            continue
    return False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pdbbind_index", required=True)
    p.add_argument("--qs40_list", required=True)
    p.add_argument("--skempi_csv", required=True)
    p.add_argument("--ecod_domains", default=None)
    p.add_argument("--outdir", default="data/complex")
    p.add_argument("--workers", type=int, default=16)
    p.add_argument("--no_redo", action="store_true")
    args = p.parse_args()

    corpus = read_codes_pdbbind(args.pdbbind_index) | read_codes_qs40(args.qs40_list)
    skempi = read_skempi_codes(args.skempi_csv)
    corpus -= skempi
    print(f"corpus after SKEMPI code removal: {len(corpus)}")

    if args.ecod_domains:
        groups = ecod_groups(args.ecod_domains)
        skempi_groups = set().union(*(groups.get(c, set()) for c in skempi))
        before = len(corpus)
        corpus = {c for c in corpus if not (groups.get(c, set()) & skempi_groups)}
        print(f"ECOD homology filter removed {before - len(corpus)} entries")

    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    with futures.ThreadPoolExecutor(args.workers) as ex:
        results = list(ex.map(lambda c: download_one(c, outdir, not args.no_redo),
                              sorted(corpus)))
    print(f"downloaded {sum(results)}/{len(corpus)} structures to {outdir}")


if __name__ == "__main__":
    main()
