"""Brute-force single-process BM25 oracle (SURVEY.md §5).

The reference ships no ranking-conformance corpus, so correctness of the
distributed engine is defined against this oracle: same tokenizer module, same
fieldnorm quantization, same scoring constants (prosearch/tantivy semantics —
k1=1.2 b=0.75, title×1.5 with tf=1, AND-of-terms, per-term boost ×2.5;
/root/reference/tantivy-cli/src/commands/serve.rs:336-419).  The engine must
be rank-identical and score-equal to 1e-5 on every fixture query.

Also reproduces the full canonicalization the engine applies before indexing:
lang filter → last-write-wins upsert on (repo,path)
(TantivyCommitter.java:48-82 delete-then-reinsert analog) → exact-content
dedup on sha256 first-wins-by-doc_key (CrawlerRunner.java:134 checksum dedup
analog) → deterministic bucketed doc_id assignment (docid.py).
"""

from __future__ import annotations

import hashlib
from collections import Counter
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

from prosearch_ray.index import docid, scoring
from prosearch_ray.index.fieldnorm import fieldnorm_to_id, id_to_fieldnorm
from prosearch_ray.text.tokenizer import tokenize

DEFAULT_LANGS = frozenset(["java", "py", "rs", "js", "go", "md", "txt"])


def canonicalize(
    corpus: pa.Table, num_buckets: int, langs: frozenset = DEFAULT_LANGS
) -> List[dict]:
    """Raw corpus rows -> canonical doc list sorted by doc_id.

    Each doc dict: doc_id, doc_key, repo, path, commit, lang, title, content,
    sha256 (bytes), bucket.
    """
    rows = corpus.to_pylist()
    # 1. lang filter (M3 analog)
    rows = [r for r in rows if r["lang"] in langs]
    for r in rows:
        r["doc_key"] = docid.doc_key(r["repo"], r["path"])
        r["sha256"] = hashlib.sha256(r["content"].encode("utf-8")).digest()
    # 2. last-write-wins upsert per doc_key: max (commit, sha256) wins
    best: Dict[str, dict] = {}
    for r in rows:
        cur = best.get(r["doc_key"])
        if cur is None or (r["commit"], r["sha256"]) > (cur["commit"], cur["sha256"]):
            best[r["doc_key"]] = r
    rows = list(best.values())
    # 3. exact content dedup: min doc_key per sha wins
    keep: Dict[bytes, dict] = {}
    for r in rows:
        cur = keep.get(r["sha256"])
        if cur is None or r["doc_key"] < cur["doc_key"]:
            keep[r["sha256"]] = r
    rows = list(keep.values())
    # 4. bucketed deterministic doc_ids
    for r in rows:
        r["bucket"] = docid.bucket_of(r["doc_key"], num_buckets)
        r["title"] = r["doc_key"]  # title := repo/path (M5 fallback analog)
    rows.sort(key=lambda r: (r["bucket"], r["doc_key"]))
    for i, r in enumerate(rows):
        r["doc_id"] = i
    return rows


class BM25Oracle:
    def __init__(
        self,
        corpus: pa.Table,
        num_buckets: Optional[int] = None,
        langs: frozenset = DEFAULT_LANGS,
        boost_terms: frozenset = scoring.DEFAULT_BOOST_TERMS,
    ):
        if num_buckets is None:
            num_buckets = docid.num_buckets_for(corpus.num_rows)
        self.num_buckets = num_buckets
        self.boost_terms = boost_terms
        self.docs = canonicalize(corpus, num_buckets, langs)
        self.n = len(self.docs)

        self.title_postings: Dict[str, Dict[int, int]] = {}
        self.body_postings: Dict[str, Dict[int, int]] = {}
        norm_t = np.zeros(self.n, dtype=np.uint8)
        norm_b = np.zeros(self.n, dtype=np.uint8)
        total_t = 0
        total_b = 0
        for d in self.docs:
            t_toks = tokenize(d["title"])
            b_toks = tokenize(d["content"])
            total_t += len(t_toks)
            total_b += len(b_toks)
            norm_t[d["doc_id"]] = fieldnorm_to_id([len(t_toks)])[0]
            norm_b[d["doc_id"]] = fieldnorm_to_id([len(b_toks)])[0]
            for term in set(t_toks):
                self.title_postings.setdefault(term, {})[d["doc_id"]] = 1
            for term, tf in Counter(b_toks).items():
                self.body_postings.setdefault(term, {})[d["doc_id"]] = tf
        self.norm_title = id_to_fieldnorm(norm_t).astype(np.float64)
        self.norm_body = id_to_fieldnorm(norm_b).astype(np.float64)
        self.avgdl_title = total_t / self.n if self.n else 0.0
        self.avgdl_body = total_b / self.n if self.n else 0.0
        self.doc_keys = [d["doc_key"] for d in self.docs]

    def search(self, query: str, k: int = scoring.DEFAULT_K) -> List[Tuple[int, str, float]]:
        plan = scoring.query_plan(query, self.boost_terms)
        if not plan:
            return []
        # AND semantics: candidate docs contain every term in title OR body
        cand: Optional[set] = None
        for term, _ in plan:
            docs = set(self.title_postings.get(term, ())) | set(
                self.body_postings.get(term, ())
            )
            cand = docs if cand is None else (cand & docs)
            if not cand:
                return []
        cand_ids = np.array(sorted(cand), dtype=np.int64)
        scores = np.zeros(len(cand_ids), dtype=np.float64)
        for term, boost in plan:
            tp = self.title_postings.get(term, {})
            bp = self.body_postings.get(term, {})
            idf_t = scoring.idf([len(tp)], self.n)[0]
            idf_b = scoring.idf([len(bp)], self.n)[0]
            tf_body = np.array([bp.get(i, 0) for i in cand_ids], dtype=np.float64)
            in_title = np.array([i in tp for i in cand_ids], dtype=bool)
            scores += scoring.score_components(
                tf_body, in_title,
                self.norm_title[cand_ids], self.norm_body[cand_ids],
                idf_t, idf_b, self.avgdl_title, self.avgdl_body, boost,
            )
        top = scoring.top_k_indices(scores, cand_ids, k)
        return [(int(cand_ids[i]), self.doc_keys[cand_ids[i]], float(scores[i])) for i in top]

    def _body_positions(self, term: str, doc: dict) -> np.ndarray:
        from prosearch_ray.text.tokenizer import expand_token

        out = []
        for i, raw in enumerate(doc["content"].split()):
            for tok in expand_token(raw):
                if tok == term:
                    out.append(i)
        return np.asarray(out, dtype=np.int64)

    def search_phrase(self, query: str, k: int = scoring.DEFAULT_K
                      ) -> List[Tuple[int, str, float]]:
        """Brute-force phrase search over the body field — same spec as
        IndexSearcher.search_phrase (consecutive whitespace positions of the
        lowercased raw tokens; tf = phrase occurrences; idf from the exact
        phrase df)."""
        import re

        edge = re.compile(r"^[^0-9A-Za-z]+|[^0-9A-Za-z]+$")
        tokens = [c.lower() for c in
                  (edge.sub("", raw) for raw in query.split()) if c]
        if not tokens:
            return []
        docs_by_id = {d["doc_id"]: d for d in self.docs}
        hits: List[Tuple[int, float]] = []
        if len(tokens) == 1:
            bp = self.body_postings.get(tokens[0], {})
            matched = [(doc, tf) for doc, tf in sorted(bp.items())]
        else:
            cand = None
            for t in tokens:
                docs = set(self.body_postings.get(t, ()))
                cand = docs if cand is None else cand & docs
                if not cand:
                    return []
            matched = []
            for doc_id in sorted(cand):
                occ = self._body_positions(tokens[0], docs_by_id[doc_id])
                for t in tokens[1:]:
                    occ = np.intersect1d(
                        occ + 1, self._body_positions(t, docs_by_id[doc_id]))
                    if len(occ) == 0:
                        break
                if len(occ):
                    matched.append((doc_id, len(occ)))
        if not matched:
            return []
        ids = np.array([d for d, _ in matched], dtype=np.int64)
        tfs = np.array([c for _, c in matched], dtype=np.float64)
        df_p = len(ids)
        scores = (scoring.idf([df_p], self.n)[0]
                  * scoring.tf_factor(tfs, self.norm_body[ids], self.avgdl_body))
        top = scoring.top_k_indices(scores, ids, k)
        return [(int(ids[i]), self.doc_keys[ids[i]], float(scores[i]))
                for i in top]

    def search_all(self, queries: pa.Table) -> pa.Table:
        """expected_topk table: qid, rank, doc_id, doc_key, score."""
        qid_o, rank_o, id_o, key_o, sc_o = [], [], [], [], []
        for row in queries.to_pylist():
            hits = self.search(row["query"], int(row.get("k", scoring.DEFAULT_K)))
            for rank, (doc_id, doc_key, score) in enumerate(hits):
                qid_o.append(row["qid"])
                rank_o.append(rank)
                id_o.append(doc_id)
                key_o.append(doc_key)
                sc_o.append(score)
        return pa.table({
            "qid": pa.array(qid_o, pa.int32()),
            "rank": pa.array(rank_o, pa.int32()),
            "doc_id": pa.array(id_o, pa.int64()),
            "doc_key": pa.array(key_o, pa.string()),
            "score": pa.array(sc_o, pa.float64()),
        })
