"""HTTP page serving: @app.page / @app.table_route parity.

Reference: faust/app/base.py:1218-1283 and the front-page word-count demo
(examples/word_count.py:35-40) — a page route renders a table lookup as
JSON over HTTP.
"""

import json
import urllib.request

import pytest

from faust_spark import App
from faust_spark.web import compile_route


def get_json(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, json.loads(r.read())


def test_compile_route_matching():
    rx = compile_route("/count/{word}/")
    assert rx.match("/count/hello/").groupdict() == {"word": "hello"}
    assert rx.match("/count/hello") is not None  # trailing slash optional
    assert rx.match("/count/a/b/") is None
    assert rx.match("/other/hello/") is None
    rx2 = compile_route("/orders/{user}/{order_id}/")
    assert rx2.match("/orders/u1/42/").groupdict() == {
        "user": "u1",
        "order_id": "42",
    }


def test_word_count_demo_end_to_end(spark):
    """The reference front-page example reproduces: count words, serve
    /count/{word}/ over HTTP, look up a word."""
    import examples.word_count as demo

    app, word_counts = demo.build("/root/testdata/sf0.001")
    # pick a real word from the data as the lookup target
    top = word_counts.orderBy("count", ascending=False).first()
    server = app.web_server(port=0)
    try:
        status, body = get_json(f"{server.url}/count/{top['word']}/")
        assert status == 200
        assert body == {top["word"]: top["count"]}
        status, body = get_json(f"{server.url}/count/zzz-not-a-word/")
        assert status == 200 and body == {"zzz-not-a-word": 0}
    finally:
        server.stop()


def test_page_returns_dataframe_and_404(spark):
    app = App("web-df", spark=spark)
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])

    @app.page("/rows/")
    def rows(web, request):
        return df.orderBy("id")

    server = app.web_server(port=0)
    try:
        status, body = get_json(f"{server.url}/rows/")
        assert status == 200
        assert body == [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]
        try:
            urllib.request.urlopen(f"{server.url}/nope/", timeout=10)
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.stop()


def test_table_route_match_info_validated(spark):
    app = App("web-bad", spark=spark)

    @app.page("/count/{word}/")
    @app.table_route(table=None, match_info="wrong_name")
    def h(web, request, word):
        return {}

    with pytest.raises(ValueError, match="wrong_name"):
        app.web_server(port=0)
