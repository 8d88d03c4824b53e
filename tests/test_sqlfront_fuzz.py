"""Hypothesis fuzz for the SQL front-end (sqlfront.py).

The statement skeleton is regex-recognized while every expression is
Catalyst-parsed, so the fragile surface is exactly the lexer helpers
(_mask_literals, _split_top) and the clause splitters (UPDATE/MERGE) when
string data contains SQL keywords, quotes, commas, and parens.  Three
layers of properties:

1. pure lexer invariants — no Spark, hundreds of examples;
2. clean-reject: arbitrary statement text either executes or raises a
   *typed* error (engine error or Spark parse/analysis error), never an
   internal IndexError/KeyError/TypeError escape;
3. round-trips against a live engine table: keyword-laden string values
   survive UPDATE/MERGE/INSERT parsing byte-for-byte, and string literals
   shaped like table identifiers are never rewritten by view binding.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from vastdb_sdk_spark.errors import VastdbSparkError
from vastdb_sdk_spark.sqlfront import _mask_literals, _split_top

# ---------------------------------------------------------------------------
# 1. lexer invariants (no Spark)

sql_text = st.lists(
    st.sampled_from(
        list("abcXYZ019 \t\n_.,()'\"`%=<>*;-") + ["''", "WHERE", "THEN", "AND"]
    ),
    max_size=40,
).map("".join)


@settings(max_examples=300, deadline=None)
@given(sql_text)
def test_mask_literals_length_and_idempotence(text):
    masked = _mask_literals(text)
    assert len(masked) == len(text)
    # masking only ever turns characters into '_', never the reverse
    for orig, m in zip(text, masked):
        assert m == orig or m == "_"
    # a masked statement has no quoted content left to mask
    assert _mask_literals(masked) == masked


@settings(max_examples=300, deadline=None)
@given(sql_text)
def test_mask_literals_hides_quoted_keywords(text):
    """No WHERE/THEN keyword in the masked copy lies inside a quoted
    span of the original (span reconstruction = the caller contract)."""
    masked = _mask_literals(text)
    for m in re.finditer(r"(?i)WHERE|THEN", masked):
        # every matched char must be identical in the original, i.e. the
        # keyword survived masking only because it is outside all literals
        assert text[m.start() : m.end()] == masked[m.start() : m.end()]


# atoms that a top-level comma can never live inside
atom = st.one_of(
    st.text(alphabet="abc XY01_=<>*", max_size=10),
    st.text(alphabet="abc,() '", max_size=8).map(
        lambda s: "'" + s.replace("'", "''") + "'"
    ),
    st.text(alphabet="abc,.=", max_size=6).map(lambda s: "(" + s + ")"),
    st.text(alphabet="ab,c", max_size=6).map(lambda s: "[" + s + "]"),
)


@settings(max_examples=300, deadline=None)
@given(st.lists(atom, min_size=1, max_size=6).filter(lambda a: a[-1] != ""))
def test_split_top_recovers_constructed_atoms(atoms):
    # a trailing empty atom is deliberately swallowed (trailing commas are
    # invalid SQL list syntax), hence the filter on the final atom
    joined = ",".join(atoms)
    assert _split_top(joined) == atoms


@settings(max_examples=200, deadline=None)
@given(sql_text)
def test_split_top_preserves_content(text):
    """Parts joined with the separator reproduce the input (modulo the
    deliberate swallow of one trailing top-level separator)."""
    parts = _split_top(text)
    rejoined = ",".join(parts)
    assert rejoined == text or rejoined + "," == text


# ---------------------------------------------------------------------------
# 2+3. statement-level fuzz against a live engine

ACCEPTABLE = (VastdbSparkError, Exception)


def _is_clean_reject(exc: BaseException) -> bool:
    """Engine-typed errors and Spark's own parse/analysis errors are clean;
    anything else (IndexError, KeyError, TypeError, AttributeError,
    UnboundLocalError, re.error ...) is an internal escape."""
    if isinstance(exc, VastdbSparkError):
        return True
    mod = type(exc).__module__ or ""
    return mod.startswith("pyspark") or mod.startswith("py4j")


@pytest.fixture(scope="module")
def fz(spark, tmp_path_factory):
    import vastdb_sdk_spark as vastdb

    session = vastdb.connect(
        str(tmp_path_factory.mktemp("sqlfuzz") / "wh"), spark=spark
    )
    session.create_bucket("bkt")
    session.execute_sql("CREATE SCHEMA bkt.s")
    session.execute_sql("CREATE TABLE bkt.s.t (a INT, name STRING)")
    session.execute_sql(
        "INSERT INTO bkt.s.t VALUES (1, 'one'), (2, 'two'), (3, 'three')"
    )
    return session


statement_junk = st.one_of(
    st.text(max_size=60),
    st.builds(
        lambda kw, body: f"{kw} {body}",
        st.sampled_from(
            [
                "SELECT", "INSERT INTO", "UPDATE", "DELETE FROM", "MERGE INTO",
                "CREATE TABLE", "DROP TABLE", "ALTER TABLE", "SHOW", "DESCRIBE",
                "OPTIMIZE", "VACUUM", "RESTORE", "TRUNCATE", "COPY", "WITH",
                "CREATE VIEW", "CREATE OR REPLACE VIEW", "DROP VIEW",
                "EXPLAIN", "SYNC TABLE", "SYNC SIGNATURES",
            ]
        ),
        st.lists(
            st.sampled_from(
                list("abc ().,'`\"*=;\n") + ["bkt.s.t", "WHERE", "SET", "VALUES"]
            ),
            max_size=20,
        ).map("".join),
    ),
)


@pytest.fixture(scope="module")
def fz_sacrificial(spark, tmp_path_factory):
    """Own warehouse for the junk-statement fuzz: statement_junk can emit
    VALID mutating statements (e.g. 'TRUNCATE bkt.s.t' — the keyword and
    the identifier are both in its alphabet), which once wiped the shared
    ``fz`` table mid-module and broke the literal-roundtrip tests with
    empty-result IndexErrors. Junk may create/trash anything here."""
    import vastdb_sdk_spark as vastdb

    session = vastdb.connect(
        str(tmp_path_factory.mktemp("sqlfuzz_junk") / "wh"), spark=spark
    )
    session.create_bucket("bkt")
    session.execute_sql("CREATE SCHEMA bkt.s")
    return session


@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(statement_junk)
def test_fuzz_clean_reject(fz_sacrificial, stmt):
    try:
        fz_sacrificial.execute_sql(stmt)
    except BaseException as exc:  # noqa: BLE001 - the property under test
        assert _is_clean_reject(exc), (
            f"internal escape {type(exc).__name__}: {exc!r} for {stmt!r}"
        )


# values whose raw text is adversarial for the clause splitters
tricky_value = st.lists(
    st.sampled_from(
        list("abc XY,()`\"=.*")
        + ["'", "''", " WHERE ", " THEN ", " SET ", " AND ", "WHEN MATCHED", ";"]
    ),
    max_size=15,
).map("".join)


def _q(v: str) -> str:
    return "'" + v.replace("'", "''") + "'"


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tricky_value)
def test_fuzz_update_literal_roundtrip(fz, value):
    """UPDATE with a keyword/quote-laden literal: the stored value must be
    byte-identical to the literal — clause splitting never eats data."""
    fz.execute_sql(f"UPDATE bkt.s.t SET name = {_q(value)} WHERE a = 2")
    got = (
        fz.execute_sql("SELECT name FROM bkt.s.t WHERE a = 2")
        .collect()[0][0]
    )
    assert got == value


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tricky_value, st.integers(min_value=10, max_value=99))
def test_fuzz_merge_literal_roundtrip(fz, value, key):
    """MERGE whose guard/SET/VALUES literals contain WHEN/THEN/commas:
    both branches must carry the literal through intact."""
    fz.execute_sql(
        f"MERGE INTO bkt.s.t USING (SELECT {key} AS a, {_q(value)} AS name) src "
        f"ON a = a "
        f"WHEN MATCHED THEN UPDATE SET name = src.name "
        f"WHEN NOT MATCHED THEN INSERT *"
    )
    got = fz.execute_sql(f"SELECT name FROM bkt.s.t WHERE a = {key}").collect()
    assert [r[0] for r in got] == [value]
    fz.execute_sql(f"DELETE FROM bkt.s.t WHERE a = {key}")


dotted_literal = st.builds(
    lambda a, b, c: f"{a}.{b}.{c}",
    *[st.sampled_from(["bkt", "s", "t", "x"]) for _ in range(3)],
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(dotted_literal)
def test_fuzz_select_literal_never_rewritten(fz, lit):
    """String literals shaped like (even real) table identifiers must not
    be rewritten by view binding."""
    rows = fz.execute_sql(
        f"SELECT {_q(lit)} AS v FROM bkt.s.t WHERE a = 1"
    ).collect()
    assert [r.v for r in rows] == [lit]


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tricky_value)
def test_fuzz_view_definition_roundtrip(fz, value):
    """A view whose SELECT embeds a keyword/quote-laden literal must store
    and serve that literal byte-identically (the binder masks quoted
    strings before identifier rewriting — a view definition is exactly
    the adversarial case: it is re-bound on every read)."""
    fz.execute_sql("CREATE OR REPLACE VIEW bkt.s.fzv AS SELECT " + _q(value) + " AS lit, a FROM bkt.s.t")
    rows = fz.execute_sql("SELECT lit FROM bkt.s.fzv").collect()
    assert rows and all(r["lit"] == value for r in rows)
