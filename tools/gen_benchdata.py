#!/usr/bin/env python3
"""Generate the synthetic bench workload once into a reusable directory.

Imports bench.generate (seed 1234) so the dataset is byte-identical to
what bench.py measures.
Usage: python tools/gen_benchdata.py OUTDIR [db_size] [n_queries] [seqlen]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from bench import generate  # noqa: E402

OUT = pathlib.Path(sys.argv[1])
DB_SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 100000
N_QUERIES = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
SEQ_LEN = int(sys.argv[4]) if len(sys.argv) > 4 else 600

OUT.mkdir(parents=True, exist_ok=True)
generate(OUT, db_size=DB_SIZE, n_queries=N_QUERIES, seq_len=SEQ_LEN)
print("wrote %s (db=%d q=%d len=%d)" % (OUT, DB_SIZE, N_QUERIES, SEQ_LEN))
