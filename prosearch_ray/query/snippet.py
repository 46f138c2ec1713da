"""Snippet generation — per-hit highlighted fragment from the body for the
query (the analog of tantivy's SnippetGenerator use at
/root/reference/tantivy-cli/src/commands/serve.rs:443-453,428-433).

Pure function of (content, matched query terms): picks the whitespace-token
window that covers the most distinct query terms (earliest such window on
ties) and wraps matched raw tokens in <b></b>, mirroring the HTML fragment
the reference returns in its SERP JSON.
"""

from __future__ import annotations

from typing import List, Sequence

from prosearch_ray.text.tokenizer import expand_token


def make_snippet(content: str, terms: Sequence[str], window: int = 24) -> str:
    term_set = set(terms)
    raw = content.split()
    if not raw:
        return ""
    matched: List[bool] = [bool(term_set.intersection(expand_token(t))) for t in raw]
    n = len(raw)
    w = min(window, n)
    best_start, best_count = 0, -1
    count = sum(matched[:w])
    best_start, best_count = 0, count
    for s in range(1, n - w + 1):
        count += matched[s + w - 1] - matched[s - 1]
        if count > best_count:
            best_start, best_count = s, count
    out = []
    for i in range(best_start, best_start + w):
        out.append(f"<b>{raw[i]}</b>" if matched[i] else raw[i])
    return " ".join(out)
