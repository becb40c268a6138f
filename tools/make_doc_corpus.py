"""Generate a synthetic document corpus with PLANTED dedup structure, at
any size, fully distributed (mapInPandas — no driver-side text), writing
only under /tmp (testdata is read-only).

Every document's text is a pure function of its doc_id (per-doc seeded
numpy), so generation is embarrassingly parallel and reruns are
bit-identical at any partitioning.

Planted structure, per block of 1000 ids (r = doc_id % 1000):

- r in [  0, 850): unique documents — Zipf-ish vocabulary, lognormal
  length (20..400 tokens, mean ~80), broken into newline "sentences";
  ~40% of docs get 1-2 BOILERPLATE lines from a fixed pool of 10
  (navigation chrome / license blocks — the high-df shingle source that
  stresses df-caps, band-key skew and segment dedup).
- r in [850, 900): EXACT duplicates — text identical to the block's doc
  with r-850 (50 exact-dup pairs per block).
- r in [900, 950): NEAR-DUP pairs — base is the block's doc with
  r-900+50; 2% of tokens substituted (J_3gram ≈ 0.8 >> 0.5).
- r in [950,1000): CHAINS — 5 chains x 10 members. Chain c member j
  applies j+1 cumulative 8%-substitution steps to base doc r'=100+c.
  Because members share the step PREFIX, adjacent members differ by
  exactly one 8% step (J_3gram ≈ 0.6 — an edge at the J>=0.5 cut) while
  members 2+ steps apart differ by >=16% of tokens (J ≈ 0.35 — below
  it), so the near-dup graph is a genuine 11-node CHAIN (base + 10
  members, diameter 10) — the topology that separates min-label
  propagation (diameter-many rounds) from large-star/small-star
  (O(log² n) rounds).

Usage: python tools/make_doc_corpus.py N [out_dir]
       (default out_dir /tmp/doccorpus_{N})
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VOCAB = 20_000
BOILERPLATE = [
    " ".join(f"bp{b}w{k}" for k in range(12)) + " all rights reserved"
    for b in range(10)
]


def _base_tokens(doc_id: int, rng: np.random.RandomState) -> list[str]:
    n = int(np.clip(rng.lognormal(mean=4.3, sigma=0.5), 20, 400))
    # Zipf-ish ranks, clipped into the vocabulary
    ranks = np.minimum(rng.zipf(1.3, size=n), VOCAB)
    return [f"w{r}" for r in ranks]


def _mutate(toks: list[str], frac: float, rng: np.random.RandomState) -> list[str]:
    out = list(toks)
    k = max(1, int(len(out) * frac))
    pos = rng.choice(len(out), size=k, replace=False)
    repl = np.minimum(rng.zipf(1.3, size=k), VOCAB)
    for p, r in zip(pos, repl):
        out[p] = f"m{r}"
    return out


def _to_text(toks: list[str], doc_id: int, rng: np.random.RandomState) -> str:
    # break into ~12-token lines; ~40% of docs get 1-2 boilerplate lines
    lines = [" ".join(toks[i : i + 12]) for i in range(0, len(toks), 12)]
    if rng.rand() < 0.4:
        for _ in range(rng.randint(1, 3)):
            lines.insert(rng.randint(0, len(lines) + 1), BOILERPLATE[rng.randint(10)])
    return "\n".join(lines)


def doc_text(doc_id: int) -> str:
    """Deterministic text for any doc_id (pure function — see module doc)."""
    block, r = divmod(doc_id, 1000)
    if r < 850:  # unique
        rng = np.random.RandomState((doc_id * 2654435761 + 11) % (2**32))
        return _to_text(_base_tokens(doc_id, rng), doc_id, rng)
    if r < 900:  # exact duplicate of unique doc r-850
        return doc_text(block * 1000 + (r - 850))
    if r < 950:  # near-dup of unique doc r-900+50
        base_id = block * 1000 + (r - 900 + 50)
        brng = np.random.RandomState((base_id * 2654435761 + 11) % (2**32))
        toks = _base_tokens(base_id, brng)
        mrng = np.random.RandomState((doc_id * 97 + 3) % (2**32))
        return _to_text(_mutate(toks, 0.02, mrng), doc_id, brng)
    # chain member: chain c = (r-950)//10, step j = (r-950)%10; member
    # j=0 IS the chain base (unmutated), so the chain is exactly the 10
    # ids [950+10c, 950+10c+10) with diameter 9.
    c, j = divmod(r - 950, 10)
    base_id = block * 1000 + 950 + c * 10
    brng = np.random.RandomState((base_id * 2654435761 + 11) % (2**32))
    # Chain docs use fixed-length, UNIFORM-random tokens and no
    # boilerplate: near-unique 3-shingles make the per-step Jaccard drop
    # tight and predictable (Zipf-headed tokens collide shingles, and
    # shared boilerplate lines add constant overlap — both smear J
    # across the 0.5 cut).
    toks = [f"c{v}" for v in brng.randint(1, VOCAB, size=140)]
    # Steps mutate DISJOINT slices of one fixed scattered permutation:
    # scattered positions kill ~3x their count in 3-shingles (adjacent
    # members land at J≈0.6), while disjointness makes differences
    # accumulate exactly (members 2+ apart fall below J=0.5 — no
    # shortcut edges; overlapping random positions would leak them).
    perm = np.random.RandomState((base_id * 31 + 7) % (2**32)).permutation(len(toks))
    m = max(1, len(toks) // 11)  # 10 steps x m fits without wrap
    for step in range(1, j + 1):
        srng = np.random.RandomState((base_id * 1013 + step * 7919) % (2**32))
        repl = np.minimum(srng.zipf(1.3, size=m), VOCAB)
        for p, rv in zip(perm[(step - 1) * m : step * m], repl):
            toks[p] = f"m{rv}s{step}"
    lines = [" ".join(toks[i : i + 12]) for i in range(0, len(toks), 12)]
    return "\n".join(lines)


def _gen(iterator):
    import pandas as pd

    for pdf in iterator:
        ids = pdf["id"].to_numpy()
        yield pd.DataFrame({"doc_id": ids, "text": [doc_text(int(i)) for i in ids]})


def make_corpus(spark, n_docs: int, out_dir: str, partitions: int = 64) -> str:
    # _gen closes over module-level doc_text: when this file is IMPORTED
    # (rather than run as __main__), cloudpickle serializes it by
    # reference, so executors must be able to import the module — ship it.
    spark.sparkContext.addPyFile(os.path.abspath(__file__))
    df = (
        spark.range(n_docs)
        .repartition(partitions)
        .mapInPandas(_gen, schema="doc_id long, text string")
    )
    df.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    return out_dir


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/doccorpus_{n}"
    from etl_wrap_spark.session import get_session

    spark = get_session("make-doc-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    make_corpus(spark, n, out)
    print(f"{n} docs -> {out}/documents.parquet")


if __name__ == "__main__":
    main()
