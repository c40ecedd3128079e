"""Catalog integrity: every query runs at sf0.001 with a stable schema,
and a sample is verified against its DuckDB oracle in-process."""

from __future__ import annotations

import os

import pytest

from rabbit_in_a_blender_spark.plans.catalog import all_oracles, all_queries

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def test_every_oracle_has_a_query():
    qs, os_ = all_queries(), all_oracles()
    assert set(os_) <= set(qs)
    assert len(qs) >= 40


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_query_runs_and_is_nonempty_schema(spark, name):
    df = all_queries()[name](spark, SF_DIR)
    assert df.columns, name
    # cheap execution check (limit keeps runtime bounded)
    df.limit(5).collect()


@pytest.mark.parametrize(
    "name", ["q1_pricing_summary", "j4_nullsafe_join", "seq_swap_assign", "ext_langid"]
)
def test_sample_queries_match_duckdb(spark, name):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import duckdb

    from check_correctness import value_hash
    from rabbit_in_a_blender_spark.core.io import TPCH_TABLES, table_path

    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF_DIR, t)}')"
        )
    sdf = all_queries()[name](spark, SF_DIR)
    srows = [r.asDict() for r in sdf.collect()]
    orows = con.sql(all_oracles()[name]).df().to_dict("records")
    assert value_hash(srows) == value_hash(orows), name


# ---- driver rotation (harness-side, /root/repo/__spark_entry__.py) ----


def _entry_module():
    import importlib.util

    path = os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("spark_entry_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_fn_fingerprint_ignores_comments_catches_body_and_helpers():
    m = _entry_module()
    base = "HELPER_SQL = 'select 1'\ndef q(spark):\n    return run(HELPER_SQL)\n"
    commented = "# a new comment\nHELPER_SQL = 'select 1'\ndef q(spark):\n    # noise\n    return run(HELPER_SQL)\n"
    body_changed = "HELPER_SQL = 'select 1'\ndef q(spark):\n    return run(HELPER_SQL.upper())\n"
    helper_changed = "HELPER_SQL = 'select 2'\ndef q(spark):\n    return run(HELPER_SQL)\n"
    unrelated_changed = "HELPER_SQL = 'select 1'\nOTHER = 3\ndef q(spark):\n    return run(HELPER_SQL)\n"
    fp = m._fn_fingerprint
    assert fp(base, "q") == fp(commented, "q")
    assert fp(base, "q") == fp(unrelated_changed, "q")
    assert fp(base, "q") != fp(body_changed, "q")
    assert fp(base, "q") != fp(helper_changed, "q")
    assert fp(base, "missing") is None


def test_fn_deep_files_tracks_only_referenced_modules():
    m = _entry_module()
    src = (
        "from rabbit_in_a_blender_spark.operators.sequence import assign_sequence\n"
        "from rabbit_in_a_blender_spark.core.io import load_tables\n"
        "from rabbit_in_a_blender_spark.plans.catalog import register\n"
        "@register('x')\n"
        "def q(spark, sf_dir):\n"
        "    return load_tables(spark, sf_dir)\n"
    )
    deep, edges = m._fn_deep_files(
        src, "q", "rabbit_in_a_blender_spark.plans.parity", "/root/repo"
    )
    assert "rabbit_in_a_blender_spark/core/io.py" in deep
    # imported but never referenced by q → not a dependency
    assert "rabbit_in_a_blender_spark/operators/sequence.py" not in deep
    # registration plumbing excluded by design
    assert "rabbit_in_a_blender_spark/plans/catalog.py" not in deep
    # symbol-level edge: q imports load_tables (and nothing else) from io
    assert "load_tables" in edges["rabbit_in_a_blender_spark.core.io"]


def test_symbol_level_staleness_ignores_unrelated_function_change():
    """VERDICT r7 task 4: a change to a module in the closure flags a
    query only when a symbol the closure actually imports from it
    moved — removing/adding an UNUSED function must not flood."""
    m = _entry_module()
    path = "rabbit_in_a_blender_spark/core/io.py"
    with open(f"/root/repo/{path}") as f:
        new = f.read()
    old_unrelated = new + "\n\ndef _brand_new_helper():\n    return 1\n"
    old_touched = new.replace(
        "names = names or TPCH_TABLES", "names = tuple(names) or TPCH_TABLES"
    )
    assert old_touched != new
    edges = {"rabbit_in_a_blender_spark.core.io": {"load_tables"}}

    class _Probe:
        def __init__(self, old_src):
            self.old = old_src

        def show(self, sha, p, root):
            return self.old

    orig = m._git_show
    try:
        m._git_show = _Probe(old_unrelated).show
        assert not m._symbols_changed(
            {path}, edges, "deadbeef", "/root/repo", {}, {}, {}
        )
        m._git_show = _Probe(old_touched).show
        assert m._symbols_changed(
            {path}, edges, "deadbeef", "/root/repo", {}, {}, {}
        )
        # whole-module import stays conservative
        m._git_show = _Probe(old_unrelated).show
        assert m._symbols_changed(
            {path},
            {"rabbit_in_a_blender_spark.core.io": {"*"}},
            "deadbeef",
            "/root/repo",
            {},
            {},
            {},
        )
    finally:
        m._git_show = orig


def test_last_green_counts_rows_only_queries():
    """err == no_oracle with a row count IS the green signal for the
    by-design rows-only queries (they must not squat the rotation)."""
    m = _entry_module()
    from rabbit_in_a_blender_spark.plans.catalog import all_oracles

    lg = m._last_green_rounds(set(all_oracles()))
    assert lg.get("ext_ivf_topk", 0) >= 3
    assert lg.get("ext_profile_approx", 0) >= 3


def test_verification_order_buckets():
    m = _entry_module()
    order = list(m.queries())
    assert set(order) == set(m.__dict__["queries"]().keys())
    # any manual reverify pins lead, in their declared order (the list
    # is emptied when no verdict order is outstanding — r6 state)
    pinned = [n for n in m._REVERIFY_FIRST if n in order]
    assert order[: len(pinned)] == pinned
    # never-green queries precede everything not pinned
    from rabbit_in_a_blender_spark.plans.catalog import all_oracles

    lg = m._last_green_rounds(set(all_oracles()))
    never = [n for n in order if n not in lg and n not in pinned]
    if never:
        first_green_pos = min(
            order.index(n) for n in order if n in lg and n not in pinned
        )
        assert max(order.index(n) for n in never) < first_green_pos
    # every catalog query appears exactly once
    assert len(order) == len(set(order))


def test_fn_fingerprint_catches_repointed_import():
    """ADVICE r8: re-pointing a package-internal import changes behavior
    through the rebound dependency without moving any def — the
    fingerprint must move; externals and unreferenced imports must not
    flood it."""
    m = _entry_module()
    base = (
        "from rabbit_in_a_blender_spark.ext.a import g\n"
        "def q(spark):\n    return g(spark)\n"
    )
    repointed = (
        "from rabbit_in_a_blender_spark.ext.b import g\n"
        "def q(spark):\n    return g(spark)\n"
    )
    rel_repointed = "from .b import g\ndef q(spark):\n    return g(spark)\n"
    rel_base = "from .a import g\ndef q(spark):\n    return g(spark)\n"
    aliased = (
        "from rabbit_in_a_blender_spark.ext.a import h as g\n"
        "def q(spark):\n    return g(spark)\n"
    )
    unref_import_added = (
        "from rabbit_in_a_blender_spark.ext.a import g\n"
        "from rabbit_in_a_blender_spark.ext.zzz import unused\n"
        "def q(spark):\n    return g(spark)\n"
    )
    external_changed = (
        "import math\n"
        "from rabbit_in_a_blender_spark.ext.a import g\n"
        "def q(spark):\n    return g(spark)\n"
    )
    fp = m._fn_fingerprint
    assert fp(base, "q") != fp(repointed, "q")
    assert fp(rel_base, "q") != fp(rel_repointed, "q")
    assert fp(base, "q") != fp(aliased, "q")
    # an import q never references does not move the fingerprint
    assert fp(base, "q") == fp(unref_import_added, "q")
    # external (non-package) imports are not part of the fingerprint
    assert fp(base, "q") == fp(external_changed, "q")


def test_class_fingerprint_is_method_granular():
    """VERDICT r10 task 3: adding an UNUSED method to a class must not
    move the fingerprint of consumers that never reach it (the r10
    stale flood: two new Warehouse methods re-flagged 74 rows), while
    editing/removing a method the closure DOES reference still must."""
    m = _entry_module()
    fp = m._fn_fingerprint
    base = (
        "class W:\n"
        "    ZONE = 'gold'\n"
        "    def write(self, df):\n"
        "        return df\n"
        "    def read(self, t):\n"
        "        return t\n"
        "def q(spark):\n"
        "    return W().write(spark)\n"
    )
    added_unused = base.replace(
        "def q(spark):",
        "    def save_bucketed_index(self, df):\n"
        "        return df.bucketed()\n"
        "def q(spark):",
    )
    edited_reached = base.replace("return df\n", "return df.distinct()\n")
    removed_reached = base.replace(
        "    def write(self, df):\n        return df\n", ""
    )
    edited_unreached = base.replace("return t\n", "return t.upper()\n")
    # attrs = what q's closure actually touches
    attrs = {"write"}
    assert fp(base, "q", attrs) == fp(added_unused, "q", attrs)
    assert fp(base, "q", attrs) != fp(edited_reached, "q", attrs)
    assert fp(base, "q", attrs) != fp(removed_reached, "q", attrs)
    # a method the closure never references can change freely
    assert fp(base, "q", attrs) == fp(edited_unreached, "q", attrs)
    # ...but with attrs=None (unparsable closure) every method counts
    assert fp(base, "q") != fp(added_unused, "q")
    assert fp(base, "q") != fp(edited_unreached, "q")
    # adding a method whose name IS referenced flags (it became real)
    attrs2 = {"write", "save_bucketed_index"}
    assert fp(base, "q", attrs2) != fp(added_unused, "q", attrs2)
    # class-level assigns are header: always compared
    header_changed = base.replace("ZONE = 'gold'", "ZONE = 'silver'")
    assert fp(base, "q", attrs) != fp(header_changed, "q", attrs)


def test_class_fingerprint_dunder_decorator_metaclass_conservatism():
    """Dunders are invoked implicitly (always compared); non-transparent
    method decorators force inclusion; metaclass falls back to the
    whole-class dump."""
    m = _entry_module()
    fp = m._fn_fingerprint
    base = (
        "class W:\n"
        "    def __init__(self, x):\n"
        "        self.x = x\n"
        "    @property\n"
        "    def path(self):\n"
        "        return self.x\n"
        "def q(spark):\n"
        "    return W(spark)\n"
    )
    attrs = set()  # q touches no attributes at all
    init_changed = base.replace("self.x = x", "self.x = x + 1")
    assert fp(base, "q", attrs) != fp(init_changed, "q", attrs)
    # transparent-decorated, unreferenced → free to change
    prop_changed = base.replace("return self.x", "return -self.x")
    assert fp(base, "q", attrs) == fp(prop_changed, "q", attrs)
    # ...unless referenced
    assert fp(base, "q", {"path"}) != fp(prop_changed, "q", {"path"})
    # registration-style decorator → always included
    reg = base.replace("@property", "@register_hook")
    reg_changed = prop_changed.replace("@property", "@register_hook")
    assert fp(reg, "q", attrs) != fp(reg_changed, "q", attrs)
    # metaclass → whole-class dump, any body change flags
    meta = base.replace("class W:", "class W(metaclass=Meta):")
    meta_added = meta.replace(
        "def q(spark):",
        "    def unused(self):\n        return 0\n"
        "def q(spark):",
    )
    assert fp(meta, "q", attrs) != fp(meta_added, "q", attrs)


def test_symbols_changed_scopes_class_methods_by_closure_attrs():
    """_symbols_changed with an attrs universe: a class growing an
    unreached method in a closure file does NOT flag, the same class
    with a reached method edited does."""
    m = _entry_module()
    path = "rabbit_in_a_blender_spark/pipeline/warehouse.py"
    with open(f"/root/repo/{path}") as f:
        new = f.read()
    # old = current minus a hypothetical method nobody calls: simulate
    # by claiming the OLD version lacked a method the NEW one has
    old_unused_added = new.replace(
        "    def append(self, df",
        "    def r11_probe_unused(self):\n"
        "        return 41\n\n"
        "    def append(self, df",
    )
    assert old_unused_added != new
    edges = {"rabbit_in_a_blender_spark.pipeline.warehouse": {"Warehouse"}}
    attrs = {"write", "append", "path"}  # closure reaches these only

    class _Probe:
        def __init__(self, old_src):
            self.old = old_src

        def show(self, sha, p, root):
            return self.old

    orig = m._git_show
    try:
        m._git_show = _Probe(old_unused_added).show
        assert not m._symbols_changed(
            {path}, edges, "deadbeef", "/root/repo", {}, {}, {}, attrs
        )
        # same delta but the closure references the method → flags
        assert m._symbols_changed(
            {path}, edges, "deadbeef", "/root/repo", {}, {}, {},
            attrs | {"r11_probe_unused"},
        )
        # attrs=None stays conservative: whole-class dump moved
        assert m._symbols_changed(
            {path}, edges, "deadbeef", "/root/repo", {}, {}, {}, None
        )
        # a reached method's body changing always flags
        old_write_changed = new.replace(
            "df.write.mode(\"append\")", "df.write.mode(\"overwrite\")", 1
        )
        assert old_write_changed != new
        m._git_show = _Probe(old_write_changed).show
        assert m._symbols_changed(
            {path}, edges, "deadbeef", "/root/repo", {}, {}, {}, attrs
        )
    finally:
        m._git_show = orig


def test_closure_attrs_unions_and_goes_conservative():
    m = _entry_module()
    attrs = m._closure_attrs(
        {"rabbit_in_a_blender_spark/core/io.py"}, "/root/repo", {}
    )
    assert attrs and "read" in attrs  # spark.read.… appears in io.py
    # unreadable file → None (conservative whole-class fingerprints)
    assert (
        m._closure_attrs({"no/such/file.py"}, "/root/repo", {}) is None
    )


def test_fn_fingerprint_ignores_docstring_changes():
    """r13: docstring edits document behavior, they don't change it —
    the fingerprint must not move for function, class, or method
    docstring changes, but must still move for body changes."""
    m = _entry_module()
    fp = m._fn_fingerprint
    base = 'def q(spark):\n    """v1 docs."""\n    return spark\n'
    redoc = 'def q(spark):\n    """v2 docs, rewritten at length."""\n    return spark\n'
    nodoc = "def q(spark):\n    return spark\n"
    body = 'def q(spark):\n    """v1 docs."""\n    return None\n'
    assert fp(base, "q") == fp(redoc, "q") == fp(nodoc, "q")
    assert fp(base, "q") != fp(body, "q")
    # class + method docstrings via the reachable-class path
    cls_a = (
        'class W:\n    """old."""\n'
        '    def write(self):\n        """old."""\n        return 1\n'
        "def q(spark):\n    return W().write()\n"
    )
    cls_b = (
        'class W:\n    """NEW class docs."""\n'
        '    def write(self):\n        """NEW method docs."""\n        return 1\n'
        "def q(spark):\n    return W().write()\n"
    )
    cls_body = (
        'class W:\n    """old."""\n'
        '    def write(self):\n        """old."""\n        return 2\n'
        "def q(spark):\n    return W().write()\n"
    )
    attrs = {"write"}
    assert fp(cls_a, "q", attrs) == fp(cls_b, "q", attrs)
    assert fp(cls_a, "q", attrs) != fp(cls_body, "q", attrs)


def test_merged_order_interleaves_stale_with_old_tail():
    """r13 ordering: staleness discounts a row's last green by
    _STALE_AGE_PENALTY rounds instead of jumping the whole queue, so a
    60+ stale flood cannot starve the oldest unchanged rows past the
    driver cap (VERDICT r12 task 3)."""
    m = _entry_module()
    import json

    order = list(m.queries())  # also refreshes VERIFY_QUEUE.json
    vq = json.load(open(os.path.join(os.path.dirname(m.__file__), "VERIFY_QUEUE.json")))
    lg = vq["last_green_round"]
    stale = set(vq["buckets"]["stale"])
    pinned = set(m._REVERIFY_FIRST) | set(vq["buckets"]["never_green"])
    ranked = [n for n in order if n not in pinned]
    # the merged key is monotone over the queue
    def key(n):
        return lg.get(n, -1) - (m._STALE_AGE_PENALTY if n in stale else 0)

    keys = [key(n) for n in ranked]
    assert keys == sorted(keys)
