#!/usr/bin/env python3
"""Generate the synthetic bench workload once into a reusable directory.

Same generator as bench.py (seed 1234) so numbers are comparable.
Usage: python tools/gen_benchdata.py OUTDIR [db_size] [n_queries] [seqlen]
"""

import pathlib
import random
import sys

OUT = pathlib.Path(sys.argv[1])
DB_SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 100000
N_QUERIES = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
SEQ_LEN = int(sys.argv[4]) if len(sys.argv) > 4 else 600

OUT.mkdir(parents=True, exist_ok=True)
rng = random.Random(1234)
alphabet = "ACGT"
seqs = []
with open(OUT / "db.fasta", "w") as fh:
    for i in range(DB_SIZE):
        seq = "".join(rng.choice(alphabet) for _ in range(SEQ_LEN))
        seqs.append(seq)
        fh.write(">db%d\n%s\n" % (i, seq))
with open(OUT / "queries.fasta", "w") as fh:
    for i in range(N_QUERIES):
        src = rng.randrange(DB_SIZE)
        seq = list(seqs[src])
        nmut = int(len(seq) * 0.05)
        for _ in range(nmut):
            pos = rng.randrange(len(seq))
            r = rng.random()
            if r < 0.9:
                seq[pos] = rng.choice(alphabet)
            elif r < 0.95 and len(seq) > 10:
                del seq[pos]
            else:
                seq.insert(pos, rng.choice(alphabet))
        fh.write(">q%d\n%s\n" % (i, "".join(seq)))
print("wrote %s (db=%d q=%d len=%d)" % (OUT, DB_SIZE, N_QUERIES, SEQ_LEN))
