"""Word count with an HTTP count page — the reference's front-page demo.

Mirrors ``/root/reference/examples/word_count.py`` end-to-end: count words
from a stream of posts into a table, then serve per-word counts over HTTP
at ``/count/{word}/``. Run::

    python examples/word_count.py [sf_dir] [port]

then::

    curl http://127.0.0.1:6066/count/the/
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from faust_spark import App
from faust_spark.catalog import load_table


def build(sf_dir: str = "/root/testdata/sf0.001"):
    app = App("word-counts")
    docs = load_table(app.spark, sf_dir, "documents")

    # the agent body: split posts into words, count into a table
    words = (
        app.stream(docs)
        .to_df()
        .select(F.explode(F.split("text", " ")).alias("word"))
    )
    word_counts = (
        words.groupBy("word").agg(F.count(F.lit(1)).alias("count")).cache()
    )

    @app.page("/count/{word}/")
    @app.table_route(table=word_counts, match_info="word")
    def get_count(web, request, word):
        rows = word_counts.filter(F.col("word") == word).collect()
        return web.json({word: rows[0]["count"] if rows else 0})

    return app, word_counts


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    port = int(sys.argv[2]) if len(sys.argv) > 2 else 6066
    app, _ = build(sf_dir)
    server = app.web_server(port=port)
    print(f"serving word counts on {server.url}/count/{{word}}/")
    try:
        server._thread.join()
    except KeyboardInterrupt:
        server.stop()
