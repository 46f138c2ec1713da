"""CLI / ``ray job submit`` entry point for BM25 search.

    python scripts/query.py --index DIR "merge hash" [--k 10] [--serp]
    python scripts/query.py --index DIR --queries queries.parquet --out hits/
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description="BM25 top-k search")
    p.add_argument("query", nargs="?", help="a single query string")
    p.add_argument("--index", required=True)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--phrase", action="store_true",
                   help="exact phrase search over the body field")
    p.add_argument("--raw", action="store_true",
                   help='raw-CLI query syntax: +must -must_not "phrase" '
                        "bare-OR (tantivy search parity)")
    p.add_argument("--sharded", action="store_true",
                   help="--index is a doc-sharded root; scatter-gather "
                        "search across one actor per shard")
    p.add_argument("--serp", action="store_true",
                   help="print the reference-shaped SERP JSON (with snippets)")
    p.add_argument("--queries", help="parquet of (qid, query[, k]) to run "
                                     "through the actor pool")
    p.add_argument("--out", help="output dir for --queries results")
    p.add_argument("--concurrency", type=int, default=4)
    p.add_argument("--num-cpus", type=int,
                   default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    if args.queries:
        if args.sharded:
            # batch path over a sharded root: pipelined scatter-gather
            # (the query file is small by nature — read driver-side)
            import pyarrow as pa
            import pyarrow.parquet as pq

            from prosearch_ray.query.sharded import ShardedSearcher

            qrows = pq.read_table(args.queries).to_pylist()
            m = ShardedSearcher(args.index)
            try:
                res = m.search_many(
                    [r["query"] for r in qrows],
                    [int(r.get("k", args.k)) for r in qrows])
            finally:
                m.shutdown()
            rows = [{"qid": r.get("qid", i), "rank": rank,
                     "doc_key": dk, "score": round(float(sc), 4)}
                    for i, (r, (keys, scores)) in enumerate(zip(qrows, res))
                    for rank, (dk, sc) in enumerate(zip(keys, scores))]
            if args.out:
                pq.write_table(
                    pa.Table.from_pylist(rows),
                    os.path.join(args.out, "hits.parquet")
                    if os.path.isdir(args.out) else args.out)
                print(json.dumps({"written": args.out, "rows": len(rows)}))
            else:
                for row in rows:
                    print(json.dumps(row))
        else:
            import ray.data as rd

            from prosearch_ray.query.actor import search_dataset

            hits = search_dataset(rd.read_parquet(args.queries), args.index,
                                  concurrency=args.concurrency)
            if args.out:
                hits.write_parquet(args.out)
                print(json.dumps({"written": args.out}))
            else:
                for row in hits.take_all():
                    print(json.dumps(row))
    else:
        if not args.query:
            p.error("either a query string or --queries is required")
        from prosearch_ray.query.serp import serp

        if args.sharded:
            from prosearch_ray.query.sharded import ShardedSearcher

            m = ShardedSearcher(args.index)
            try:
                if args.serp:
                    print(json.dumps(serp(m, args.query, args.k), indent=2))
                else:
                    fn = (m.search_raw if args.raw else
                          m.search_phrase if args.phrase else m.search)
                    keys, scores = fn(args.query, args.k)
                    for rank, (dk, sc) in enumerate(zip(keys, scores)):
                        print(json.dumps({"rank": rank, "doc_key": str(dk),
                                          "score": round(float(sc), 4)}))
            finally:
                m.shutdown()
        else:
            from prosearch_ray.query.searcher import IndexSearcher

            s = IndexSearcher(args.index)
            if args.serp:
                print(json.dumps(serp(s, args.query, args.k), indent=2))
            else:
                fn = (s.search_raw if args.raw else
                      s.search_phrase if args.phrase else s.search)
                ids, scores = fn(args.query, args.k)
                for rank, (d, sc) in enumerate(zip(ids, scores)):
                    print(json.dumps({"rank": rank, "doc_id": int(d),
                                      "doc_key": str(s.doc_keys[int(d)]),
                                      "score": round(float(sc), 4)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
