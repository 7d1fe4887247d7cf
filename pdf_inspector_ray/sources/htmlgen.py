"""Deterministic synthetic HTML fixtures for the boilerplate-strip axis."""

from __future__ import annotations

import numpy as np

_WORDS = ("data stream batch window merge sort key table scan join filter "
          "group query row value line part order customer supply market "
          "report quarter region growth margin revenue capital board plan").split()


def _sentence(rng, n=12) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n)) + "."


def make_article_page(seed: int) -> str:
    """A page with nav/header/footer/sidebar boilerplate around a real
    article (title, headings, paragraphs, list)."""
    rng = np.random.default_rng(seed)
    paras = ["  ".join(_sentence(rng) for _ in range(3)) for _ in range(4)]
    lis = [_sentence(rng, 6) for _ in range(3)]
    related = "".join(
        f'<li><a href="/r/{i}">related story {i} click here</a></li>'
        for i in range(6))
    return f"""<!DOCTYPE html>
<html><head><title>Article {seed}</title>
<script>var tracking = {seed};</script>
<style>.x {{ color: red }}</style></head>
<body>
<header><a href="/">Home</a> | <a href="/news">News</a> | <a href="/about">About</a></header>
<nav><ul><li><a href="/a">Section A</a></li><li><a href="/b">Section B</a></li></ul></nav>
<main>
<h1>Deep Dive {seed}: The State of the Pipeline</h1>
<p>{paras[0]}</p>
<h2>Background and Context</h2>
<p>{paras[1]}</p>
<p>{paras[2]}</p>
<ul><li>{lis[0]}</li><li>{lis[1]}</li><li>{lis[2]}</li></ul>
<h2>Conclusions</h2>
<p>{paras[3]}</p>
</main>
<aside><h3>Related</h3><ul>{related}</ul></aside>
<footer>Copyright {2020 + seed % 7}. <a href="/tos">Terms</a> <a href="/priv">Privacy</a></footer>
</body></html>"""


def make_linkfarm_page(seed: int) -> str:
    """Nearly all boilerplate: a link directory page."""
    rng = np.random.default_rng(seed + 1000)
    links = "".join(
        f'<li><a href="/cat/{i}">{_sentence(rng, 4)}</a></li>' for i in range(30))
    return (f"<html><head><title>Directory {seed}</title></head><body>"
            f"<div><ul>{links}</ul></div></body></html>")


def html_fixture_pool(n_articles: int = 6, n_linkfarms: int = 2) -> dict[str, str]:
    pool = {}
    for i in range(n_articles):
        pool[f"article_{i:02d}"] = make_article_page(i)
    for i in range(n_linkfarms):
        pool[f"linkfarm_{i:02d}"] = make_linkfarm_page(i)
    return pool


def build_html_table(n_rows: int = 200, seed: int = 42):
    """Arrow table (doc_id, html) cycling the fixture pool."""
    import pyarrow as pa

    pool = html_fixture_pool()
    names = sorted(pool)
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, len(names), size=n_rows)
    return pa.table({
        "doc_id": pa.array(range(n_rows), pa.int64()),
        "fixture": pa.array([names[i] for i in idx], pa.string()),
        "html": pa.array([pool[names[i]] for i in idx], pa.string()),
    })


HTML_GENERATOR_VERSION = 1  # bump when corpus output changes


def write_html_corpus(out_dir: str, n_rows: int, seed: int = 42,
                      rows_per_file: int = 2000) -> list[str]:
    """Write the HTML corpus as parquet with frozen golden_* columns (the
    expected html_extract_batch outputs per distinct fixture) so the driver
    can oracle the distributed extraction against a table the pipeline
    never computes from."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..stages.html_stage import html_extract_batch

    table = build_html_table(n_rows, seed=seed)
    pool = html_fixture_pool()
    names = sorted(pool)
    g = html_extract_batch(pa.table({
        "doc_id": pa.array(range(len(names)), pa.int64()),
        "html": pa.array([pool[n] for n in names], pa.string()),
    }))
    by_name = {
        n: i for i, n in enumerate(names)}
    idx = [by_name[f] for f in table["fixture"].to_pylist()]

    def take(col, typ):
        vals = g[col].to_pylist()
        return pa.array([vals[i] for i in idx], typ)

    table = (table
             .append_column("golden_title", take("title", pa.string()))
             .append_column("golden_markdown", take("markdown", pa.large_string()))
             .append_column("golden_n_blocks", take("n_blocks", pa.int32()))
             .append_column("golden_n_content_blocks",
                            take("n_content_blocks", pa.int32()))
             .append_column("golden_error_kind", take("error_kind", pa.string())))
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for start in range(0, table.num_rows, rows_per_file):
        path = os.path.join(out_dir, f"html-{start // rows_per_file:05d}.parquet")
        pq.write_table(table.slice(start, rows_per_file), path,
                       row_group_size=2000)
        paths.append(path)
    return paths
