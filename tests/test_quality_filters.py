"""C4 line-rule + Gopher doc-rule quality filters (quality_filters.py).

Golden hand-computed fixtures exercising each rule edge, plus a DuckDB
parity check for the driver-contract queries.

Reference rules are public: C4 (Raffel et al. 2020 §2.2), Gopher
(Rae et al. 2021 A1.1).
"""

import pytest

from corpus_dedup_spark.operators.quality_filters import (
    c4_line_filter,
    gopher_quality_flags,
)

GOOD_LINE = "the quick brown fox jumps over it."  # 7 words, terminal '.'


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _page(n_good_lines, extra=""):
    return "\n".join([GOOD_LINE] * n_good_lines) + extra


class TestC4LineFilter:
    def test_line_rules(self, spark):
        rows = [
            (0, "one two three."),            # kept: 3 words, terminal
            (1, "one two."),                  # dropped: < 3 words
            (2, "one two three four"),        # dropped: no terminal punct
            (3, "enable JavaScript to view."),  # dropped: javascript
            (4, 'he said "yes he did"'),      # kept: quote is terminal
            (5, "is this really a question?"),  # kept: '?'
            (6, "  one two three.   "),       # kept: rtrim before last char
        ]
        out = {r["doc_id"]: r for r in
               c4_line_filter(_df(spark, rows)).collect()}
        assert [out[i]["n_kept"] for i in range(7)] == [1, 0, 0, 0, 1, 1, 1]
        assert out[0]["clean_text"] == "one two three."
        assert out[1]["clean_text"] == ""  # empty join, never NULL

    def test_page_rules(self, spark):
        rows = [
            (0, _page(5)),                       # kept: 5 surviving lines
            (1, _page(4)),                       # dropped: only 4 survive
            (2, _page(5, "\nlorem ipsum dolor sit amet.")),  # dropped
            (3, _page(5, "\nvar f = function() {.")),        # dropped: brace
        ]
        out = {r["doc_id"]: r for r in
               c4_line_filter(_df(spark, rows)).collect()}
        assert [out[i]["page_kept"] for i in range(4)] == [1, 0, 0, 0]
        # clean_text is produced even for rejected pages
        assert out[1]["clean_text"] == _page(4)

    def test_multiline_mix(self, spark):
        text = "short.\none two three!\njavascript required here.\nno punct"
        row = c4_line_filter(_df(spark, [(0, text)])).collect()[0]
        assert row["n_lines"] == 4
        assert row["n_kept"] == 1
        assert row["clean_text"] == "one two three!"


WORDS_60 = " ".join(["the", "cat", "sat", "and", "ran"] * 12) + "."


class TestGopherQuality:
    def _one(self, spark, text):
        return gopher_quality_flags(_df(spark, [(0, text)])).collect()[0]

    def test_passing_doc(self, spark):
        r = self._one(spark, WORDS_60)
        assert r["n_words"] == 60
        assert r["gopher_pass"] == 1

    def test_word_count_bounds(self, spark):
        r = self._one(spark, "too few words here.")
        assert r["wc_ok"] == 0 and r["gopher_pass"] == 0

    def test_mean_word_length(self, spark):
        # 60 one-char words: mean length 1 < 3 → mwl_ok = 0
        r = self._one(spark, " ".join(["a"] * 60))
        assert r["wc_ok"] == 1 and r["mwl_ok"] == 0

    def test_symbol_ratio(self, spark):
        r = self._one(spark, WORDS_60 + " " + "# " * 10)
        assert r["n_sym"] >= 10 and r["sym_ok"] == 0

    def test_bullet_share(self, spark):
        # every line a bullet → 10·n > 9·n fails
        r = self._one(spark, "\n".join(["• the cat and that have"] * 10))
        assert r["n_bullet"] == 10 and r["bullet_ok"] == 0

    def test_ellipsis_share(self, spark):
        text = WORDS_60 + "\n" + "\n".join(["wait..."] * 5)
        r = self._one(spark, text)
        assert r["n_ellipsis"] == 5 and r["ellipsis_ok"] == 0

    def test_alpha_share(self, spark):
        # 30 alpha + 30 numeric words → 50% < 80%
        text = " ".join(["cat"] * 30 + ["123"] * 30) + " the and of."
        r = self._one(spark, text)
        assert r["alpha_ok"] == 0

    def test_stop_words_exact_tokens(self, spark):
        # 'their'/'toffee' contain 'the'/'to' as substrings but are not tokens
        base = " ".join(["their", "toffee", "cat", "dog", "run"] * 12)
        r = self._one(spark, base)
        assert r["n_stop"] == 0 and r["stop_ok"] == 0
        r2 = self._one(spark, base + " the with")
        assert r2["n_stop"] == 2 and r2["stop_ok"] == 1

    def test_integer_flag_types(self, spark):
        df = gopher_quality_flags(_df(spark, [(0, WORDS_60)]))
        assert all(f.dataType.simpleString() == "bigint"
                   for f in df.schema.fields if f.name != "doc_id")


@pytest.mark.parametrize("qname", ["c4_line_filter", "gopher_quality"])
def test_oracle_parity(spark, qname):
    """Value-level parity with the DuckDB oracle at sf0.001 (driver replica)."""
    duckdb = pytest.importorskip("duckdb")
    from corpus_dedup_spark.plans import queries as Q

    sf = "/root/testdata/sf0.001"
    sdf = Q.QUERIES[qname](spark, sf)
    srows = sorted(
        tuple(repr(v) for _, v in sorted(r.asDict().items()))
        for r in sdf.collect())

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM read_parquet('{sf}/documents.parquet')")
    cols = None
    res = con.execute(Q.ORACLES[qname])
    cols = [d[0] for d in res.description]
    orows = sorted(
        tuple(repr(v) for _, v in sorted(zip(cols, row)))
        for row in res.fetchall())
    assert srows == orows
