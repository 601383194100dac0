#!/usr/bin/env python3
"""Generate sf0.1-equivalent and sf1-equivalent documents/embeddings
fixtures for the dedup-family scale ramp (SCALING.md).

The driver ships sf0.001/0.01/0.1 only; the judge asked for one more
measured decade for the dedup family. Rather than extrapolating against
the driver's (unknown) generator, this produces BOTH scales from ONE
generator with the same distributional shape as the shipped tables —
31-token vocabulary, 20 sources, 5 langs (en-heavy), doc lengths ~50-550
chars, a few exact copies and ~3% near-dup mutations, 64-dim embeddings
in 6 gaussian clusters with a small near-dup population — so the slope
between the two points is generator-consistent even if the absolute row
mix differs slightly from the driver's.

Usage: python3 tools/gen_ramp_fixture.py <outRoot>
Writes <outRoot>/sfA/{documents,embeddings}.parquet (5k docs / 2k vecs)
and <outRoot>/sfB/... (50k docs / 20k vecs). Deterministic (seed 42).
"""
import sys, random, math
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ("key agg row scan slow fast table value part hash batch window "
         "spark order data column join small line customer the big merge "
         "stream filter group vector query index dup").split()
assert len(VOCAB) >= 30
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.44, 0.15, 0.14, 0.14, 0.13]


def gen_docs(n, rng):
    docs = []
    for i in range(n):
        r = rng.random()
        if i > 10 and r < 0.003:  # exact copy of an earlier doc
            src_doc = docs[rng.randrange(len(docs))]
            text = src_doc[1]
        elif i > 10 and r < 0.03:  # near-dup: mutate a few tokens
            toks = docs[rng.randrange(len(docs))][1].split(" ")
            for _ in range(max(1, len(toks) // 20)):
                toks[rng.randrange(len(toks))] = VOCAB[rng.randrange(len(VOCAB))]
            text = " ".join(toks)
        else:
            target = rng.randint(50, 550)
            toks, ln = [], 0
            while ln < target:
                t = VOCAB[rng.randrange(len(VOCAB))]
                toks.append(t)
                ln += len(t) + 1
            text = " ".join(toks)
        lang = rng.choices(LANGS, weights=LANG_W)[0]
        source = f"src{rng.randrange(20)}"
        docs.append((i, text, lang, source, len(text)))
    return docs


def gen_embs(n, rng):
    dim, k = 64, 6
    centers = []
    for _ in range(k):
        v = [rng.gauss(0, 1) for _ in range(dim)]
        nrm = math.sqrt(sum(x * x for x in v))
        centers.append([x / nrm for x in v])
    out = []
    for i in range(n):
        if i > 10 and rng.random() < 0.02:  # near-dup vector: tiny jitter
            base = out[rng.randrange(len(out))][1]
            v = [x + rng.gauss(0, 0.002) for x in base]
            label = out[-1][2]
        else:
            label = rng.randrange(k)
            c = centers[label]
            v = [x + rng.gauss(0, 0.25) for x in c]
        nrm = math.sqrt(sum(x * x for x in v)) or 1.0
        v = [x / nrm for x in v]
        out.append((i, v, label))
    return out


def write(outdir, docs, embs):
    import os
    os.makedirs(outdir, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": [d[1] for d in docs],
        "lang": [d[2] for d in docs],
        "source": [d[3] for d in docs],
        "n_chars": pa.array([d[4] for d in docs], pa.int64()),
    }), f"{outdir}/documents.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array([e[0] for e in embs], pa.int64()),
        "embedding": pa.array([e[1] for e in embs], pa.list_(pa.float32())),
        "label": pa.array([e[2] for e in embs], pa.int32()),
    }), f"{outdir}/embeddings.parquet")


if __name__ == "__main__":
    root = sys.argv[1]
    rng = random.Random(42)
    write(f"{root}/sfA", gen_docs(5000, rng), gen_embs(2000, rng))
    rng = random.Random(43)
    write(f"{root}/sfB", gen_docs(50000, rng), gen_embs(20000, rng))
    print("wrote", root)
