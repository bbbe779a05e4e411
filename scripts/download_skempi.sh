#!/bin/bash
# Fetch SKEMPI v2 (metadata + cleaned PDBs) for PackPPI-AP training.
set -e
OUT="${1:-data/skempi}"
mkdir -p "$OUT"
wget -q -O "$OUT/skempi_v2.csv" "https://life.bsc.es/pid/skempi2/database/download/skempi_v2.csv"
wget -q -O "$OUT/SKEMPI2_PDBs.tgz" "https://life.bsc.es/pid/skempi2/database/download/SKEMPI2_PDBs.tgz"
tar -xzf "$OUT/SKEMPI2_PDBs.tgz" -C "$OUT"
echo "SKEMPI v2 ready under $OUT"
