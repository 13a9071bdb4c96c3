"""excludeAttributes end-to-end (models/index.go:6 -> disabled field
mapping at store/store.go:127-133): an excluded column is neither
indexed (``field:value`` matches nothing — unknown-field semantics)
nor stored (it never appears in hits or the docs table), even when the
caller also listed it in attr_cols / text_cols.
"""

import pandas as pd
import pytest

from bright_spark.index.builder import build_index
from bright_spark.models import IndexConfig
from bright_spark.query.engine import SearchEngine


@pytest.fixture(scope="module")
def excl_engine(spark, tmp_path_factory):
    rows = pd.DataFrame([
        {"doc_id": i, "text": f"alpha beta doc{i}", "secret": f"s{i % 2}",
         "kept": f"k{i % 3}", "lang": "en"}
        for i in range(20)
    ])
    idx_dir = str(tmp_path_factory.mktemp("idx") / "excl")
    build_index(spark, spark.createDataFrame(rows), idx_dir,
                IndexConfig(id="excl", tokenizer="simple",
                            exclude_attributes=("secret",)),
                content_col="text", id_col="doc_id", lang_col="lang",
                attr_cols=("secret", "kept"), text_cols=("secret",),
                n_build_partitions=4)
    return SearchEngine(spark, idx_dir)


def test_excluded_attr_not_stored(spark, excl_engine):
    assert "secret" not in excl_engine.catalog.docs(spark).columns
    assert "kept" in excl_engine.catalog.docs(spark).columns


def test_excluded_attr_does_not_match(excl_engine):
    # unknown-field semantics: a must clause on it kills the query
    assert excl_engine.search_df("secret:s0", k=5).count() == 0
    assert excl_engine.search_df("+secret:s0 alpha", k=5).count() == 0
    # the non-excluded attr still filters
    assert excl_engine.search_df("kept:k0 alpha", k=50).count() == 7


def test_excluded_attr_not_indexed(spark, excl_engine):
    fields = {r["field"] for r in
              excl_engine.catalog.term_stats(spark).select("field")
              .distinct().collect()}
    assert fields == {"text"}


def test_excluded_attr_absent_from_hits(excl_engine):
    resp = excl_engine.search("alpha")
    assert resp.hits
    for h in resp.hits:
        assert "secret" not in h
        assert "kept" in h


def test_exclude_reserved_column_rejected(spark, tmp_path_factory):
    rows = spark.createDataFrame(
        pd.DataFrame([{"doc_id": 1, "text": "x", "lang": "en"}]))
    with pytest.raises(ValueError, match="exclude_attributes"):
        build_index(spark, rows,
                    str(tmp_path_factory.mktemp("idx") / "bad"),
                    IndexConfig(id="bad", exclude_attributes=("text",)),
                    content_col="text", id_col="doc_id", lang_col="lang")
