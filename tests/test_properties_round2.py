"""Property-based tests (hypothesis) for round-2 components: SWAR
popcount, LSH band tuning, 16-bit quantization invariants, SqlCheck
equivalence, and a Turtle serialize→parse roundtrip."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from xpshacl_ray.functions.dedup import choose_bands, hamming64, popcount_u64
from xpshacl_ray.sources.ttl import parse_turtle


@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                min_size=1, max_size=50))
def test_popcount_matches_python(xs):
    arr = np.array(xs, dtype=np.uint64)
    got = popcount_u64(arr)
    for x, g in zip(xs, got):
        assert int(g) == bin(x).count("1")


@given(st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
       st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1))
def test_hamming_symmetric_and_bounded(a, b):
    d = hamming64(a, b)
    assert 0 <= d <= 64
    assert d == hamming64(b, a)
    assert hamming64(a, a) == 0


@given(st.sampled_from([16, 32, 64, 128]),
       st.floats(min_value=0.05, max_value=0.95))
def test_choose_bands_divides_and_tracks_threshold(num_perm, t):
    b = choose_bands(num_perm, t)
    assert num_perm % b == 0
    # a clearly higher threshold never wants MORE bands
    if t <= 0.85:
        assert choose_bands(num_perm, min(t + 0.1, 0.95)) <= b


@given(st.lists(st.integers(min_value=0, max_value=(1 << 61) - 1),
                min_size=4, max_size=64))
def test_quantization_never_lowers_slot_agreement(sig):
    # 16-bit truncation can only merge slots, never split them: the
    # quantized agreement count dominates the full-width one
    rng = np.random.default_rng(0)
    a = np.array(sig, dtype=np.uint64)
    b = a.copy()
    flip = rng.random(len(b)) < 0.5
    b[flip] ^= np.uint64(0x10000)  # differ only above the low 16 bits
    full = (a == b).mean()
    quant = ((a & np.uint64(0xFFFF)) == (b & np.uint64(0xFFFF))).mean()
    assert quant >= full


_IDENT = st.from_regex(r"[a-z][a-z0-9]{0,8}", fullmatch=True)
_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
    max_size=40)


@settings(max_examples=50, deadline=None)
@given(st.lists(
    st.tuples(_IDENT, _IDENT,
              st.one_of(_TEXT.map(lambda s: ("lit", s)),
                        _IDENT.map(lambda s: ("iri", s)))),
    min_size=1, max_size=12))
def test_turtle_roundtrip(triples):
    def esc(s):
        return s.replace("\\", "\\\\").replace('"', '\\"') \
                .replace("\n", "\\n").replace("\r", "\\r") \
                .replace("\t", "\\t")

    lines = ["@prefix ex: <http://example.org/> ."]
    for s, p, (kind, o) in triples:
        if kind == "lit":
            lines.append(f'ex:{s} ex:{p} "{esc(o)}" .')
        else:
            lines.append(f"ex:{s} ex:{p} ex:{o} .")
    parsed, _ = parse_turtle("\n".join(lines))
    got = {(t.s, t.p, t.o, t.kind) for t in parsed}
    want = {
        (f"http://example.org/{s}", f"http://example.org/{p}",
         (o if kind == "lit" else f"http://example.org/{o}"),
         ("literal" if kind == "lit" else "iri"))
        for s, p, (kind, o) in triples
    }
    assert got == want


def test_sqlcheck_equals_python_predicate():
    import ray.data
    from hypothesis import find  # noqa: F401  (hypothesis import sanity)

    from xpshacl_ray import SqlCheck, ValidationEngine, ValidationSpec

    rng = np.random.default_rng(3)
    n = 500
    t = pa.table({"id": pa.array(range(n), pa.int64()),
                  "x": pa.array(rng.integers(-50, 50, n), pa.int64())})
    spec = ValidationSpec(
        constraints=[SqlCheck(column="x", where="x*x > 900", columns=["x"])],
        id_columns=["id"], focus_template="r:{id}")
    out = ValidationEngine(spec).validate(ray.data.from_arrow(t)).to_pandas()
    xs = np.asarray(t["x"])
    assert sorted(out["id"]) == [int(i) for i in np.flatnonzero(xs * xs > 900)]


@settings(max_examples=30, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=20))
def test_scaled_int_matches_duckdb_round(xs):
    import duckdb

    import __ray_entry__ as entrymod

    got = entrymod._to_scaled_int(np.array(xs), 100)
    con = duckdb.connect()
    for x, g in zip(xs, got):
        want = con.execute(
            "SELECT CAST(round(? * 100) AS BIGINT)", [x]).fetchone()[0]
        assert int(g) == want, (x, int(g), want)


# --- new text ops vs DuckDB on random inputs --------------------------------

_texty = st.text(
    alphabet=st.sampled_from(list("ab the xyz  ")), max_size=40)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.one_of(st.none(), _texty), min_size=1, max_size=8))
def test_remove_stopwords_matches_duckdb_list_filter(texts):
    import duckdb

    from xpshacl_ray.functions.text import remove_stopwords

    t = pa.table({"text": pa.array(texts, pa.string())})
    got = remove_stopwords(t)["text_clean"].to_pylist()
    # coalesce: duckdb's array_to_string of an EMPTY list is NULL; the
    # engine's contract is '' for an all-stopword doc (oracle matches)
    want = duckdb.connect().execute(
        "SELECT CASE WHEN text IS NULL THEN NULL ELSE coalesce("
        "array_to_string(list_filter(str_split(text, ' '), "
        "x -> x NOT IN ('a','the')), ' '), '') END FROM t"
    ).fetchall()
    assert got == [r[0] for r in want]


@settings(max_examples=40, deadline=None)
@given(st.lists(_texty, min_size=1, max_size=6))
def test_partial_doc_frequency_matches_duckdb(texts):
    import duckdb

    from xpshacl_ray.functions.text import partial_doc_frequency

    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    p = partial_doc_frequency(t)
    got = dict(zip(p["term"].to_pylist(), p["partial_df"].to_pylist()))
    want = {r[0]: r[1] for r in duckdb.connect().execute(
        "WITH toks AS (SELECT doc_id, unnest(str_split(lower(text), ' ')) "
        "AS term FROM t), dt AS (SELECT DISTINCT doc_id, term FROM toks "
        "WHERE term <> '') SELECT term, count(*) FROM dt GROUP BY term"
    ).fetchall()}
    assert got == want


_filter_exprs = st.sampled_from([
    "($this % 2) != 0",
    "STRLEN($this) <= 5",
    "$this < 0 || $this > 100",
    '!($this = "x") && STRLEN($this) > 1',
    'REGEX($this, "^[ab]+$")',
    'CONTAINS($this, "b") || STRSTARTS($this, "a")',
    "ABS($this) >= 2",
])


@settings(max_examples=30, deadline=None)
@given(_filter_exprs)
def test_sparql_translation_is_executable_duckdb(expr):
    import duckdb

    from xpshacl_ray.sources.ttl import sparql_filter_to_sql

    sql = sparql_filter_to_sql(
        "SELECT $this WHERE { FILTER ( " + expr + " ) }", "v")
    assert sql is not None
    stringy = any(f in expr for f in
                  ("STRLEN", "REGEX", "CONTAINS", "STRSTARTS", '"'))
    numeric = not stringy
    t = (pa.table({"v": pa.array([1, -3, 42, None], pa.int64())})
         if numeric else
         pa.table({"v": pa.array(["x", "ab", "", None], pa.string())}))
    out = duckdb.connect().execute(
        f"SELECT coalesce(({sql}), FALSE) FROM t").fetchall()
    assert len(out) == t.num_rows  # executes and is null-safe


# --- codec roundtrips on random media ---------------------------------------


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=1, max_value=16),
       st.integers(min_value=1, max_value=16),
       st.integers(min_value=0, max_value=2**32 - 1))
def test_png_roundtrip_random_images(w, h, seed):
    import numpy as np

    from xpshacl_ray.stages.multimodal import decode_png, encode_png

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=1, max_value=12),
       st.integers(min_value=1, max_value=12),
       st.integers(min_value=1, max_value=4),
       st.integers(min_value=2, max_value=32),
       st.integers(min_value=0, max_value=2**32 - 1))
def test_gif_roundtrip_random_animations(w, h, nf, n_colors, seed):
    import numpy as np

    from xpshacl_ray.stages.multimodal import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    frames = rng.integers(0, n_colors, size=(nf, h, w), dtype=np.uint8)
    out = decode_gif(encode_gif(frames, pal))
    assert out.shape == (nf, h, w, 3)
    assert np.array_equal(out, pal[frames])
