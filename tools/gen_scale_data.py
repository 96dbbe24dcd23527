"""Deterministic synthetic data generator for scale-sweep points the
driver does not ship (notably sf1).

The driver provides /root/testdata/sf{0.001,0.01,0.1} (read-only,
seed=42). The round-4 verdict's top ask is a MEASURED sf0.1 -> sf1
scaling exponent for the heaviest queries, which needs an sf1 point
with the same schema and distribution SHAPE. This generator reproduces
the construction inferred from the shipped data (every rule below was
checked against sf0.01/sf0.1 with DuckDB — row-count ratios, key
cardinalities, value ranges, lines-per-order Poisson(4) from uniform
orderkey draws, the 31-word document vocabulary, uniform 10-100 word
lengths, ~0.16% exact-dup injection, unit-norm 64-dim embeddings with
x4-per-decade row growth) so per-query cost drivers (rows, join
fan-in, distinct keys, dup/near-dup rates, skew) extrapolate
faithfully. It is NOT byte-identical to the driver's generator and is
used ONLY for scaling probes — correctness oracles keep running on the
driver's own data.

Output goes inside the repo (default .scaling/sf1 — gitignored; do NOT
write to /root/testdata, which is read-only by contract).

Vocabulary modes (--vocab): ``legacy`` (default) reproduces the
driver corpus's 31-word closed vocabulary exactly; ``open`` swaps the
token vocabulary for a 50k-token Zipf(1.07) draw — document count,
length distribution, dup/near-dup injection RATES, and every other
table keep the legacy CONSTRUCTION (same generators, same
parameters). Not byte-for-byte: open mode consumes the shared RNG
stream differently from the first fresh document on, so which docs
become dups and the post-text tables (langs, embeddings) are a
different draw with identical distributions — cross-mode comparisons
are rate-faithful, not row-identical. Rationale
(round-5 verdict ask #1): the 31-word vocabulary saturates every
fixed-size shingle/gram/signature space at sf10, so the TRUE match
volume grows quadratically and wall time for the match-emitting dedup
operators grows with it — a data artifact, not a plan property. An
open vocabulary keeps shingle collisions at realistic (natural-text)
rates so those operators' scaling exponents become measurable.

Usage: python tools/gen_scale_data.py [sf] [out_dir] [--vocab legacy|open]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "the,spark,fast,customer,batch,data,sort,value,hash,filter,big,dup,"
    "column,order,a,vector,part,scan,slow,agg,key,window,table,merge,"
    "join,line,small,group,query,row,stream"
).split(",")
ADJS = "blue,old,small,new,large,hot,cold,red".split(",")
NOUNS = "widget,gizmo,ring,gear,anvil,bolt,plate,rod".split(",")
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]

DAY_US = 86_400_000_000

# --vocab open: 50k-token Zipf(1.07) vocabulary. s≈1.07 is the
# classic fit for natural-language word frequencies (Zipf 1949;
# Piantadosi 2014 review), V=50k ≈ a BPE-scale vocabulary. Tokens are
# fixed-width ids so text length stays in the legacy 10-100-word /
# ~5.6-chars-per-word envelope.
OPEN_VOCAB_SIZE = 50_000
OPEN_VOCAB_S = 1.07


def _open_vocab_probs(v: int = OPEN_VOCAB_SIZE, s: float = OPEN_VOCAB_S) -> np.ndarray:
    p = 1.0 / np.arange(1, v + 1, dtype="float64") ** s
    return p / p.sum()


def _ts_us(date_str: str) -> int:
    import datetime as dt

    d = dt.datetime.fromisoformat(date_str)
    return int(d.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))


def _round2(a: np.ndarray) -> np.ndarray:
    return np.round(a, 2)


def generate(
    sf: float, out_dir: str, seed: int = 42, vocab_mode: str = "legacy"
) -> dict[str, int]:
    if vocab_mode not in ("legacy", "open"):
        raise ValueError(f"vocab_mode must be legacy|open, got {vocab_mode!r}")
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_doc = int(50_000 * sf)
    # embeddings grow x4 per decade in the shipped data (500 @ sf0.01,
    # 2000 @ sf0.1) — quadratic-candidate operators get a deliberately
    # tempered corpus
    n_emb = int(round(500 * (sf / 0.01) ** np.log10(4)))

    _write(
        out_dir,
        "region",
        pa.table(
            {"r_regionkey": pa.array(range(5), pa.int32()), "r_name": REGIONS}
        ),
    )
    _write(
        out_dir,
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": [f"NATION_{i}" for i in range(25)],
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
            }
        ),
    )
    _write(
        out_dir,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": pa.array(
                    rng.integers(0, 25, n_cust), pa.int32()
                ),
                "c_acctbal": _round2(rng.uniform(-1000, 10000, n_cust)),
                "c_mktsegment": np.array(SEGMENTS)[
                    rng.integers(0, 5, n_cust)
                ],
            }
        ),
    )
    _write(
        out_dir,
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": pa.array(
                    rng.integers(0, 25, n_supp), pa.int32()
                ),
                "s_acctbal": _round2(rng.uniform(-1000, 10000, n_supp)),
            }
        ),
    )
    pk = np.arange(n_part)
    _write(
        out_dir,
        "part",
        pa.table(
            {
                "p_partkey": pa.array(pk, pa.int64()),
                "p_name": [
                    f"{ADJS[a]} {NOUNS[b]}"
                    for a, b in zip(
                        rng.integers(0, 8, n_part), rng.integers(0, 8, n_part)
                    )
                ],
                "p_brand": [
                    f"Brand#{i}" for i in rng.integers(1, 26, n_part)
                ],
                "p_type": np.array(PTYPES)[rng.integers(0, 6, n_part)],
                "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
                "p_retailprice": _round2(900.0 + (pk % 1000) * 0.1),
            }
        ),
    )
    od_lo, od_hi = _ts_us("1995-01-01"), _ts_us("2001-08-01")
    odate = (
        rng.integers(od_lo // DAY_US, od_hi // DAY_US + 1, n_ord) * DAY_US
    )
    _write(
        out_dir,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
                "o_custkey": pa.array(
                    rng.integers(0, n_cust, n_ord), pa.int64()
                ),
                "o_orderstatus": np.array(["O", "P", "F"])[
                    rng.integers(0, 3, n_ord)
                ],
                "o_totalprice": _round2(rng.uniform(1000, 500000, n_ord)),
                "o_orderdate": pa.array(odate, pa.timestamp("us")),
                "o_orderpriority": np.array(PRIORITIES)[
                    rng.integers(0, 5, n_ord)
                ],
            }
        ),
    )
    sd_lo, sd_hi = _ts_us("1995-01-02"), _ts_us("2001-11-04")
    sdate = rng.integers(sd_lo // DAY_US, sd_hi // DAY_US + 1, n_li) * DAY_US
    _write(
        out_dir,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(
                    rng.integers(0, n_ord, n_li), pa.int64()
                ),
                "l_partkey": pa.array(
                    rng.integers(0, n_part, n_li), pa.int64()
                ),
                "l_suppkey": pa.array(
                    rng.integers(0, n_supp, n_li), pa.int64()
                ),
                "l_linenumber": pa.array(
                    rng.integers(1, 8, n_li), pa.int32()
                ),
                "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
                "l_extendedprice": _round2(rng.uniform(900, 105000, n_li)),
                "l_discount": rng.integers(0, 11, n_li) / 100.0,
                "l_tax": rng.integers(0, 9, n_li) / 100.0,
                "l_returnflag": np.array(["N", "A", "R"])[
                    rng.integers(0, 3, n_li)
                ],
                "l_linestatus": np.array(["O", "F"])[
                    rng.integers(0, 2, n_li)
                ],
                "l_shipdate": pa.array(sdate, pa.timestamp("us")),
            }
        ),
    )
    ev_lo = _ts_us("2024-01-01")
    ev_ts = ev_lo + rng.integers(0, 30 * DAY_US, n_ev)
    _write(
        out_dir,
        "events",
        pa.table(
            {
                "event_id": pa.array(np.arange(n_ev), pa.int64()),
                "ts": pa.array(ev_ts, pa.timestamp("us")),
                "user_id": pa.array(
                    rng.integers(0, n_users, n_ev), pa.int64()
                ),
                "event_type": np.array(EVENT_TYPES)[
                    rng.integers(0, 5, n_ev)
                ],
                "value": _round2(rng.exponential(50.0, n_ev)),
                "props": [
                    json.dumps({"k": int(k)})
                    for k in rng.integers(0, 100, n_ev)
                ],
            }
        ),
    )
    # documents: 10-100 words from the 31-word vocabulary. Dup signal
    # mirrors the shipped corpora: ~0.16% verbatim copies of an earlier
    # doc (8 exact-dup pairs per 5000 docs at sf0.1) plus ~4.9%
    # single-word-edit copies (the shipped sf0.1 MinHash pair table has
    # 255 pairs, 8 exact + 247 at shingle-jaccard 0.89-0.99 whose
    # sequence diff is one word deleted/inserted — checked with
    # difflib against the engine's own near-dup output)
    n_words = rng.integers(10, 101, n_doc)
    if vocab_mode == "open":
        # fixed-width token ids; one flat Zipf draw up front (per-doc
        # rng.choice with a 50k-probability vector is ~100x slower).
        # Dup/edit docs reuse earlier texts and consume nothing from
        # the flat stream, so n_words.sum() is an upper bound.
        vocab = np.array(
            [f"t{i:05d}" for i in range(1, OPEN_VOCAB_SIZE + 1)]
        )
        flat = vocab[
            rng.choice(
                OPEN_VOCAB_SIZE, int(n_words.sum()), p=_open_vocab_probs()
            )
        ]
    else:
        vocab = np.array(VOCAB)
        flat = None
    off = 0
    texts: list[str] = []
    for i in range(n_doc):
        roll = rng.random()
        if i > 0 and roll < 0.0016:
            texts.append(texts[int(rng.integers(0, i))])
        elif i > 0 and roll < 0.0510:
            w = texts[int(rng.integers(0, i))].split()
            if rng.random() < 0.5 and len(w) > 1:
                del w[int(rng.integers(0, len(w)))]
            else:
                w.insert(
                    int(rng.integers(0, len(w) + 1)),
                    str(vocab[int(rng.integers(0, len(vocab)))]),
                )
            texts.append(" ".join(w))
        elif flat is not None:
            texts.append(" ".join(flat[off : off + n_words[i]]))
            off += int(n_words[i])
        else:
            texts.append(
                " ".join(vocab[rng.integers(0, len(vocab), n_words[i])])
            )
    langs = np.array(LANGS)[
        rng.choice(5, n_doc, p=np.array(LANG_W) / sum(LANG_W))
    ]
    _write(
        out_dir,
        "documents",
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_doc), pa.int64()),
                "text": texts,
                "lang": langs,
                "source": [f"src{i % 20}" for i in range(n_doc)],
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        ),
    )
    emb = rng.normal(0, 1, (n_emb, 64)).astype("float32")
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    _write(
        out_dir,
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(np.arange(n_emb), pa.int64()),
                "embedding": pa.array(
                    list(emb), pa.list_(pa.float32())
                ),
                "label": pa.array(
                    rng.integers(0, 10, n_emb), pa.int32()
                ),
            }
        ),
    )
    return {
        "customer": n_cust,
        "supplier": n_supp,
        "part": n_part,
        "orders": n_ord,
        "lineitem": n_li,
        "events": n_ev,
        "documents": n_doc,
        "embeddings": n_emb,
    }


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("sf", nargs="?", type=float, default=1.0)
    ap.add_argument("out_dir", nargs="?", default=None)
    ap.add_argument("--vocab", choices=("legacy", "open"), default="legacy")
    ns = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    suffix = "" if ns.vocab == "legacy" else "-open"
    out = ns.out_dir or os.path.join(
        repo, ".scaling", f"sf{ns.sf:g}{suffix}"
    )
    counts = generate(ns.sf, out, vocab_mode=ns.vocab)
    print(
        json.dumps(
            {"sf": ns.sf, "out": out, "vocab": ns.vocab, "rows": counts}
        )
    )


if __name__ == "__main__":
    main()
