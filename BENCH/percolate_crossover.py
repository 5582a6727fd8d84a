"""Percolation route crossover: broadcast-dict vs inverted-postings.

Routes a fixed 2,000-doc batch against standing query sets of
1k / 10k / 100k / 1M saved searches, timing BOTH routes:

* ``percolate`` — driver dict -> broadcast query relation + pushed
  ``isin`` vocabulary filter (the bounded-set fast path),
* ``percolate_inverted`` — term -> query posting relation built in
  Spark (``build_query_postings``, amortized once per standing-set
  update) + one term equi-join (the Lucene-percolator regime).

The broadcast route's cost has TWO parts the sweep separates: the
driver-side dict/relation construction (grows with the standing set,
pure driver work) and the route itself (broadcast grows).  At 10^6
queries the dict route is architecture-inappropriate (the driver
materializes every query); it is measured up to 100k and recorded as
skipped beyond, with the reason.  Match parity between routes is
asserted at every size that runs both.

Writes BENCH/percolate_crossover.json.
Usage: python BENCH/percolate_crossover.py [sizes_csv] [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from index_spark.operators.percolate import (  # noqa: E402
    build_query_postings,
    percolate,
    percolate_inverted,
)
from index_spark.session import get_spark  # noqa: E402
from index_spark.sources.corpus import generate_corpus  # noqa: E402

DICT_ROUTE_CAP = 100_000


def main() -> None:
    sizes = ([int(x) for x in sys.argv[1].split(",")]
             if len(sys.argv) > 1 else [1_000, 10_000, 100_000, 1_000_000])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    spark = get_spark(cores=32, shuffle_partitions=32)

    pdf = generate_corpus(n_files=n_docs)
    docs = (spark.createDataFrame(pdf)
            .select(F.monotonically_increasing_id().alias("doc_id"),
                    F.col("content")).persist())
    docs.count()

    # deterministic standing queries over the corpus' own vocabulary:
    # query i = two mid-frequency terms picked by affine index maps
    vocab = [r["term"] for r in
             spark.createDataFrame(pdf).selectExpr(
                 "explode(filter(split(lower(content), '[^a-z0-9]+'), "
                 "x -> x != '')) AS term")
             .groupBy("term").count()
             .orderBy(F.desc("count")).limit(4000)
             .collect()][500:3500]             # skip stop-ish head terms
    varr = F.array(*[F.lit(t) for t in vocab])
    nv = len(vocab)

    def standing_df(n: int):
        i1 = ((F.col("id") * 7) % nv + 1).cast("int")
        i2 = ((F.col("id") * 13 + 3) % nv + 1).cast("int")
        return (spark.range(n).select(
            F.col("id").alias("query_id"),
            F.concat_ws(" ", F.element_at(varr, i1),
                        F.element_at(varr, i2)).alias("query")))

    results = []
    for n in sizes:
        rec: dict = {"standing": n}
        st = standing_df(n).persist()
        st.count()

        t0 = time.time()
        qp = build_query_postings(st, stem=True, camel=True).persist()
        qp.count()
        rec["invert_build_s"] = round(time.time() - t0, 3)
        t0 = time.time()
        inv_matches = percolate_inverted(docs, qp, mode="and").count()
        rec["inverted_route_s"] = round(time.time() - t0, 3)
        rec["matches"] = inv_matches

        if n <= DICT_ROUTE_CAP:
            t0 = time.time()
            qdict = {int(r["query_id"]): r["query"] for r in st.collect()}
            rec["dict_build_s"] = round(time.time() - t0, 3)
            t0 = time.time()
            bc_matches = percolate(docs, qdict, mode="and").count()
            rec["dict_route_s"] = round(time.time() - t0, 3)
            rec["match_parity"] = bc_matches == inv_matches
        else:
            rec["dict_route_s"] = None
            rec["dict_skipped"] = ("driver materializes every standing "
                                   "query; architecture-inappropriate "
                                   f"past {DICT_ROUTE_CAP}")
        qp.unpersist()
        st.unpersist()
        results.append(rec)
        print(rec, flush=True)

    out = {"n_docs": n_docs, "vocab": nv, "results": results}
    with open(os.path.join(REPO, "BENCH", "percolate_crossover.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
