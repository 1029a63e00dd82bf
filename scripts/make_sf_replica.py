"""Replicate a fixture scale factor N× into key-offset universes.

The per-round oracle gate tops out at sf0.1 (`TESTDATA.md`); the sf1
verification sweeps (SURVEY.md "Round-12 sf1 ORACLE sweep") need a 10×
corpus that preserves every schema and referential relationship while
NOT inflating planted near-duplicate density quadratically. Strategy,
matching the sweep described in SURVEY.md:

- `region`/`nation` (dims) are copied once — universes share them,
  exactly as 1000 executors share broadcast dims at 100 TB.
- Every fact/extension table is concatenated N times with each key
  domain offset by ``universe * stride`` where the stride is computed
  once per key DOMAIN (customer keys offset identically in `customer`
  and `orders`, order keys in `orders` and `lineitem`, …) so joins
  stay closed within a universe.
- `documents.text` is re-alphabeted per universe: every non-space
  printable-ASCII character is relabeled into a per-universe
  codepoint block (`chr(0x4E00 + u*0x80 + ord(c) - 0x21)`; universe 0
  stays byte-identical to the source). A character bijection is
  simultaneously a bijection on char k-grams AND on whitespace tokens
  (and hence word shingles), so within a universe EVERY pairwise
  char-gram and word-shingle Jaccard is IDENTICAL to the source's;
  and because the universes' alphabets are DISJOINT codepoint ranges,
  no token and no k-gram containing a non-space character can be
  shared across universes — cross-universe Jaccard is exactly 0 at
  both granularities, so no dedup pass (MinHash banding at word or
  char grain, SimHash, containment, passage, ExactSubstr, CC
  chaining) can pair copies across universes. TRUE pair density
  (pairs over any exact-Jaccard threshold) is therefore exactly
  linear in copies at BOTH granularities. Note the distinction for
  BANDED-LSH observables: relabeling redraws every gram/shingle
  hash, so each universe is an INDEPENDENT draw of the banding's
  randomness over identical structure — candidate counts vary per
  universe (measured at 20x for qx20's 2x8 char banding: 602 to
  33,498 per universe, source draw 21,796) while verified >=0.7
  outputs stay tight (194-255 per universe around the source's 253,
  the residual being candidate-recall variance at j just above the
  threshold). Sums over universes concentrate around copies x the
  banding's expectation — linear in expectation, with the LSH's own
  variance, not an instrument artifact.
  FOUR earlier suffix-tag designs failed and are worth recording —
  the common flaw being that any deterministic per-token SUFFIX
  preserves word structure but distorts char-gram structure:
  (1) a per-DOC suffix only blocks EXACT duplicates (a suffixed copy
  keeps ~0.97 shingle Jaccard with its original — every doc gained
  C(copies,2) cross-universe near-dup twins, quadratic pair
  structure); (2) a UNIFORM per-token tag injected the same
  char-grams into every token of a universe, pushing unrelated short
  docs above near-dup thresholds (qx20 blew up from ~9k to 22.7M
  pairs at sf1); (3) the `~UUHH` form (2-digit universe literal +
  2 hex chars of md5(token)) bounded per-pair deviation but its
  universe-wide digit grams + 256-bucket hash space inflated
  AGGREGATE char structure ~8x per tagged universe — measured 21,796
  source-structure candidates -> 1,701,977 at 10x in qx20's 2x8
  banding, with ~57k-pair cross-universe buckets; (4) a partitioned
  62^4-space hash suffix (value = h(token)*copies + u) removed every
  universe-wide literal yet STILL inflated structure (919,620 at
  10x; 8,375,287 at 20x) because a deterministic suffix multiplies
  the shared-gram mass of every COMMON token: two docs sharing 'the'
  share ~9 grams of 'the~XYZW' where the source shared ~2. The
  character relabeling has no suffix at all, so there is nothing to
  amplify. Source text outside printable ASCII is refused up front
  (an unmapped character would be shared across universes).
  `n_chars` is length-preserved by construction and re-asserted.
- `embeddings.embedding` is ROLLED by the universe index (cyclic shift
  of the float vector) — cheap, deterministic, norm-preserving, and it
  decorrelates cosine structure across universes. Rolling is cyclic
  with period = embedding dim, so ``--copies`` above the dim would
  silently reintroduce byte-identical vectors; the generator refuses.

Both engines (Spark and the DuckDB oracle) read the same written
parquet, so none of these choices can affect parity — they only shape
the data distribution the sweep runs on.

Usage:
    python scripts/make_sf_replica.py --src /root/testdata/sf0.1 \
        --dst /tmp/sf1 --copies 10
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd

# key domains: domain -> [(table, column), ...]; stride computed per
# domain over the union of its columns, so every referencing table
# offsets the same key identically.
KEY_DOMAINS = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
}

SHARED_DIMS = ("region", "nation")
REPLICATED = (
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _strides(tables: dict[str, pd.DataFrame]) -> dict[str, int]:
    out = {}
    for domain, cols in KEY_DOMAINS.items():
        hi = max(int(tables[t][c].max()) for t, c in cols)
        # next power of ten above the max key: offsets stay readable
        # in failure output and can never collide across universes.
        stride = 10 ** len(str(hi))
        out[domain] = stride
    return out


# Per-universe alphabet blocks: non-space printable ASCII
# (0x21-0x7E, 94 chars) relabels into 0x80-wide slices of the CJK
# Unified Ideographs block (0x4E00..0x9FFF, 20,992 codepoints — no
# whitespace, no surrogates, valid in parquet UTF-8); 100 copies use
# 12,800 of them. A char bijection preserves every within-universe
# char-gram AND word-shingle Jaccard exactly; disjoint target blocks
# make cross-universe overlap exactly zero at both granularities.
_RELABEL_BASE = 0x4E00
_RELABEL_STRIDE = 0x80
_ASCII_LO, _ASCII_HI = 0x21, 0x7E


def _relabel_table(u: int) -> dict[int, int]:
    base = _RELABEL_BASE + u * _RELABEL_STRIDE
    return {
        c: base + (c - _ASCII_LO) for c in range(_ASCII_LO, _ASCII_HI + 1)
    }


def _offset_universe(
    name: str,
    pdf: pd.DataFrame,
    u: int,
    strides: dict[str, int],
    copies: int,
) -> pd.DataFrame:
    out = pdf.copy(deep=False)
    for domain, cols in KEY_DOMAINS.items():
        for t, c in cols:
            if t == name:
                out[c] = out[c] + u * strides[domain]
    if u > 0 and name == "documents":
        table = _relabel_table(u)
        out["text"] = out["text"].map(lambda t: t.translate(table))
        # length-preserving by construction; assert rather than trust
        if not (out["text"].str.len() == out["n_chars"]).all():
            raise SystemExit(
                "relabeled text length diverged from n_chars — "
                "source text/n_chars inconsistent?"
            )
    if u > 0 and name == "embeddings":
        mat = np.stack(out["embedding"].to_numpy())
        # keep float32: a float64 roundtrip would silently widen the
        # parquet schema to list<double> and change stored values
        rolled = np.roll(mat, u, axis=1).astype(np.float32)
        out["embedding"] = list(rolled)
    return out


def _validate_pad(copies: int) -> None:
    """The one guard that needs no table data — checked right after
    argparse so a bad --copies refuses before paying the full source
    parquet load (the data-dependent embedding-dim check stays in
    :func:`_validate_copies`)."""
    if copies > 100:
        raise SystemExit(
            "--copies > 100: the per-universe alphabet pad reserves "
            "100 disjoint 0x80-wide codepoint blocks from 0x4E00; "
            "going further needs a wider reserved range — widen the "
            "pad to go further"
        )


def _validate_copies(copies: int, tables: dict[str, pd.DataFrame]) -> None:
    """Refuse invalid --copies BEFORE anything is written: a mid-run
    refusal used to leave a partial replica directory (customer..events
    already written) that a later sweep could consume as a valid scale
    dir. All guards run up front; the destination is not even created
    on refusal."""
    if tables["embeddings"].empty:
        raise SystemExit(
            "embeddings fixture is empty: cannot determine the "
            "embedding dim the cyclic-roll guard needs"
        )
    dim = len(tables["embeddings"]["embedding"].iloc[0])
    if copies - 1 >= dim:
        raise SystemExit(
            f"--copies {copies} >= embedding dim {dim}: "
            "np.roll is cyclic, universe dim would duplicate "
            "universe 0's vectors exactly"
        )
    # the alphabet relabeling only maps printable ASCII; an unmapped
    # character would pass through VERBATIM into every universe and
    # break the exact cross-universe disjointness guarantee
    bad = ~tables["documents"]["text"].map(
        lambda t: all(c == " " or _ASCII_LO <= ord(c) <= _ASCII_HI for c in t)
    )
    if bad.any():
        raise SystemExit(
            f"documents.text has {int(bad.sum())} rows with characters "
            "outside space/printable-ASCII — the per-universe alphabet "
            "relabeling cannot guarantee universe disjointness for them"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()

    _validate_pad(args.copies)
    tables = {
        t: pd.read_parquet(os.path.join(args.src, f"{t}.parquet"))
        for t in SHARED_DIMS + REPLICATED
    }
    _validate_copies(args.copies, tables)
    os.makedirs(args.dst, exist_ok=True)
    strides = _strides(tables)
    for t in SHARED_DIMS:
        tables[t].to_parquet(
            os.path.join(args.dst, f"{t}.parquet"), index=False
        )
        print(f"{t}: shared dim, {len(tables[t])} rows")
    for t in REPLICATED:
        parts = [
            _offset_universe(t, tables[t], u, strides, args.copies)
            for u in range(args.copies)
        ]
        full = pd.concat(parts, ignore_index=True)
        full.to_parquet(os.path.join(args.dst, f"{t}.parquet"), index=False)
        print(f"{t}: {len(tables[t])} -> {len(full)} rows")
    print("strides:", strides)


if __name__ == "__main__":
    main()
