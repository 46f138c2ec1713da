"""HTML SERP + statistics pages — the reference's server-rendered surface
(S9; /root/reference/src/main/java/com/milindmantri/pages/SearchPage.java:92-156,
StatisticsPage.java:48-91), rendered to strings from the same data the JSON
surface exposes.  No web server is shipped (out of scope per SURVEY.md §6);
any HTTP layer can serve these strings verbatim.

Structure parity with the reference:
- search page: doctype, head (charset/viewport meta, ``<q> | <title>`` title,
  inline style), h1, GET search form, latency line, one ``div`` per hit with
  linked h3 title + linked span url + snippet paragraph, "no results" h3 when
  empty, trailing hr + link to /stats/;
- stats page: table of (Domain, Indexed Pages, Size) with pg_size_pretty
  sizes, h1 linking back to /search/.
"""

from __future__ import annotations

import html as _html
import time
from typing import Iterable, Tuple

from prosearch_ray.functions.scalar import pretty_size
from prosearch_ray.index import scoring

DEFAULT_TITLE = "Programmer's Search"
QUERY_PARAM = "q"
_CSS = ("body{font-family:sans-serif;max-width:60em;margin:auto}"
        "div{margin:1em 0}span{color:#006621}")


def _esc(s: str) -> str:
    return _html.escape(s, quote=True)


def _head(title: str) -> str:
    return ("<head><meta charset=\"utf-8\">"
            "<meta name=\"viewport\" content=\"width=device-width, "
            "initial-scale=1.0\">"
            f"<title>{_esc(title)}</title><style>{_CSS}</style></head>")


def render_search_page(searcher, q: str = "",
                       nhits: int = scoring.DEFAULT_K) -> str:
    """Server-rendered SERP for query ``q`` (empty = landing page).
    ``searcher`` is any ``search_with_snippets`` + ``last_count`` provider
    (``IndexSearcher`` or ``ShardedSearcher``)."""
    title = f"{q} | {DEFAULT_TITLE}" if q.strip() else DEFAULT_TITLE
    parts = ["<!DOCTYPE html>", "<html>", _head(title), "<body>",
             f"<h1>{_esc(DEFAULT_TITLE)}</h1>",
             ("<form method=\"GET\" action=\"\">"
              f"<input type=\"text\" name=\"{QUERY_PARAM}\" "
              f"value=\"{_esc(q)}\" placeholder=\"Type your text here...\">"
              "<button type=\"submit\">Search</button></form>")]
    if q.strip():
        t0 = time.perf_counter()
        hits = searcher.search_with_snippets(q, nhits)
        latency_ms = (time.perf_counter() - t0) * 1000.0
        parts.append(f"<p><strong>Search latency: {latency_ms:.3f}ms"
                     "</strong></p>")
        parts.append(f"<p>{int(searcher.last_count)} documents matched</p>")
        if hits:
            parts.append("<section>")
            for h in hits:
                url = _esc(h["doc_key"])
                parts.append(
                    f"<div><a href=\"{url}\" target=\"_blank\">"
                    f"<h3>{_esc(h['title'])}</h3></a>"
                    f"<a href=\"{url}\" target=\"_blank\">"
                    f"<span>{url}</span></a>"
                    f"<p>{h['snip']}</p></div>")
            parts.append("</section>")
        else:
            parts.append("<h3>Sorry, no search results found!</h3>")
        parts.append("<hr>")
    parts.append("<div><a href=\"/stats/\">Statistics</a></div>")
    parts.extend(["</body>", "</html>"])
    return "".join(parts)


def render_stats_page(stats: Iterable[Tuple[str, int, int]]) -> str:
    """Statistics table from (domain, n_pages, total_bytes) rows — the
    pg_size_pretty rollup the reference reads from its domain_stats table
    (StatisticsHttpHandler.java:33-45)."""
    rows = []
    for domain, links, size_bytes in stats:
        rows.append(f"<tr><td>{_esc(str(domain))}</td>"
                    f"<td>{int(links)}</td>"
                    f"<td>{_esc(pretty_size(int(size_bytes)))}</td></tr>")
    return "".join([
        "<!DOCTYPE html>", "<html>", _head(f"Statistics | {DEFAULT_TITLE}"),
        "<body>",
        (f"<h1>Statistics | <a href=\"/search/\">{_esc(DEFAULT_TITLE)}</a>"
         "</h1>"),
        ("<table><thead><tr><th>Domain</th><th>Indexed Pages</th>"
         "<th>Size</th></tr></thead><tbody>"),
        *rows,
        "</tbody></table>", "</body>", "</html>"])
