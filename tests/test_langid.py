"""Char-trigram language ID (functions/langid.py)."""
import pytest

from evolution_spark.functions.langid import (
    K,
    PROFILES,
    SEED_TEXTS,
    build_profiles,
    classify_language,
    profile_rows,
)


def test_profiles_deterministic_and_sql_safe():
    assert len(SEED_TEXTS) == 20
    assert build_profiles() == PROFILES
    rows = profile_rows()
    assert len(rows) == 20 * K
    for lang, tri, w in rows:
        assert len(tri) == 3 and 1 <= w <= K
        # embeds into a SQL literal without escaping
        assert "'" not in tri and "\\" not in tri
    for text in SEED_TEXTS.values():
        assert "'" not in text and "\\" not in text
        assert text == text.lower()


def test_self_and_natural_classification(spark):
    langs = sorted(SEED_TEXTS)
    df = spark.createDataFrame(
        [(i, SEED_TEXTS[l]) for i, l in enumerate(langs)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.pred_lang for r in classify_language(df).collect()}
    assert got == {i: l for i, l in enumerate(langs)}
    # natural text (not the seed sentences) still lands on the right
    # language for clearly-marked cases
    nat = spark.createDataFrame(
        [
            (0, "she said that the weather was better than they had"
                " thought and everyone wanted to stay outside"),
            (1, "die regierung hat gestern eine neue entscheidung über"
                " die schulen und ihre zukunft getroffen"),
            (2, "los trabajadores de la ciudad quieren mejores"
                " condiciones para sus familias y sus hijos"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.pred_lang for r in classify_language(nat).collect()}
    assert got[0] == "en" and got[1] == "de" and got[2] == "es"


def test_no_signal_yields_no_row(spark):
    df = spark.createDataFrame([(7, "qqqq")], "doc_id long, text string")
    assert classify_language(df).collect() == []


def test_plan_broadcasts_profiles(spark):
    df = spark.createDataFrame([(1, "hello world")],
                               "doc_id long, text string")
    plan = classify_language(df)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "BroadcastHashJoin" in plan
