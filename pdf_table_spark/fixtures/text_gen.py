"""Deterministic ground-truth text corpus for the assembly-tier scale
bench (BASELINE.md round 4): every stage of
``ops.prepare.assemble_training_set`` fires on a KNOWN fraction of the
corpus, so a 50M-doc run is verified by exact stage counts, not
eyeballed.

Region layout (fractions of ``n_docs``, fixed boundaries, pure
function of the row index — any partitioning produces the same doc):

  * ``dup``     1.0 %  — clusters of 100 byte-identical docs; the
                         exact-dedup gate must drop 99 per cluster;
  * ``gopher``  2.0 %  — 10-token docs, under any sane min-word gate;
  * ``c4``      1.0 %  — full-length docs with no terminal
                         punctuation (0 sentences);
  * ``neardup`` 0.5 %  — clusters of 4 docs sharing a 31-token core,
                         one replica-unique token each (word-3-gram
                         Jaccard ≈ 0.875 — above the 0.8 threshold,
                         caught by MinHash-LSH, verified exactly);
  * ``contam``  0.5 %  — clean docs that embed the first 16 words of
                         one benchmark doc verbatim (4 shared token
                         13-grams → decontamination must flag them);
  * rest        95 %   — unique clean docs.

Every doc interleaves a per-content marker token after every word, so
token n-grams NEVER collide across unrelated docs (the mostly-distinct
regime a real web corpus lives in — see the hot-bucket trap writeup in
BASELINE.md): near-dup signal exists exactly where this generator
plants it. Stopword/sentence/word-length shapes are chosen to pass the
Gopher + C4 gates at ``min_words <= 20``.

The benchmark table shares the corpus word formula, so contaminated
docs match by construction. ``bench_n_grams(n_bench)`` predicts the
distinct 13-gram count — sized above ``decontaminate``'s 5M-gram
broadcast limit, the 50M run exercises the shuffled semi-join path.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

CORPUS_SCHEMA = "doc_id string, text string, source string"
BENCH_SCHEMA = "doc_id string, text string"

# region fractions (of n_docs); cluster sizes fixed
F_DUP, DUP_CLUSTER = 0.01, 100
F_GOPHER = 0.02
F_C4 = 0.01
F_NEAR, NEAR_CLUSTER = 0.005, 4
F_CONTAM = 0.005

SOURCES = ("web", "books", "code", "wiki")

_CONS = "bcdfglmnprstvz"
_VOW = "aeiou"
_SYL = [c + v for c in _CONS for v in _VOW]  # 70 distinct syllables
_STOP = ("the", "be", "to", "of", "and", "that", "have", "with")
_MASK = (1 << 61) - 1


def _word(i: int) -> str:
    """Unique 2+-syllable word per index (base-70 syllable digits) —
    never 1 syllable, so it can't collide with a Gopher stopword."""
    out = [_SYL[i % 70], _SYL[(i // 70) % 70]]
    i //= 4900
    while i:
        out.append(_SYL[i % 70])
        i //= 70
    return "".join(out)


def _h(ck: int, j: int) -> int:
    return (ck * 2654435761 + j * 40503 + (ck >> 11)) & _MASK


def regions(n_docs: int) -> dict[str, tuple[int, int]]:
    """Half-open [lo, hi) index ranges per region, cluster-aligned."""
    dup_hi = (int(n_docs * F_DUP) // DUP_CLUSTER) * DUP_CLUSTER
    gopher_hi = dup_hi + int(n_docs * F_GOPHER)
    c4_hi = gopher_hi + int(n_docs * F_C4)
    near_hi = c4_hi + ((int(n_docs * F_NEAR) // NEAR_CLUSTER)
                       * NEAR_CLUSTER)
    contam_hi = near_hi + int(n_docs * F_CONTAM)
    return {"dup": (0, dup_hi), "gopher": (dup_hi, gopher_hi),
            "c4": (gopher_hi, c4_hi), "neardup": (c4_hi, near_hi),
            "contam": (near_hi, contam_hi),
            "kept_unique": (contam_hi, n_docs)}


def expected_stages(n_docs: int) -> dict[str, int]:
    """Ground-truth ``provenance.stage`` histogram for a corpus of
    ``n_docs`` run through assemble_training_set (first-failing
    stage; cluster canonicals survive to 'kept')."""
    r = regions(n_docs)
    n_dup = r["dup"][1] - r["dup"][0]
    n_near = r["neardup"][1] - r["neardup"][0]
    dup_drop = n_dup - n_dup // DUP_CLUSTER
    near_drop = n_near - n_near // NEAR_CLUSTER
    return {
        "dup": dup_drop,
        "gopher": r["gopher"][1] - r["gopher"][0],
        "c4": r["c4"][1] - r["c4"][0],
        "neardup": near_drop,
        "contaminated": r["contam"][1] - r["contam"][0],
        "kept": n_docs - dup_drop
        - (r["gopher"][1] - r["gopher"][0])
        - (r["c4"][1] - r["c4"][0]) - near_drop
        - (r["contam"][1] - r["contam"][0]),
    }


def _bench_word_ids(b: int, n: int) -> list[int]:
    return [_h(b * 7 + 3, 1000 + j) % 200_000 for j in range(n)]


def bench_text(b: int, n_words: int = 30) -> str:
    return " ".join(_word(i) for i in _bench_word_ids(b, n_words))


def bench_n_grams(n_bench: int, n_words: int = 30, n: int = 13) -> int:
    """Distinct token n-grams the benchmark side contributes."""
    return n_bench * (n_words - n + 1)


def _lines(ck: int, n_words: int, marker: str,
           terminal: bool = True) -> list[str]:
    """``n_words`` content words + interleaved marker, 6 tokens per
    line, '.' attached to each line's last token when ``terminal``.
    Two leading DISTINCT stopwords satisfy the Gopher stopword gate."""
    s0 = ck % 8
    s1 = (s0 + 1 + (ck >> 3) % 7) % 8
    words = [_STOP[s0], _STOP[s1]] + [
        _word(_h(ck, j) % 200_000) for j in range(n_words - 2)]
    toks: list[str] = []
    for w in words:
        toks.append(w)
        toks.append(marker)
    lines = []
    for i in range(0, len(toks), 6):
        chunk = toks[i:i + 6]
        if terminal:
            chunk[-1] += "."
        lines.append(" ".join(chunk))
    return lines


def doc_row(idx: int, n_docs: int, n_bench: int) -> tuple[str, str, str]:
    """(doc_id, text, source) for row ``idx`` — pure function."""
    r = regions(n_docs)
    doc_id = f"d{idx:09d}"
    if idx < r["dup"][1]:
        ck = 3_000_000_000 + idx // DUP_CLUSTER
        text = "\n".join(_lines(ck, 9, f"q{ck:09x}"))
    elif idx < r["gopher"][1]:
        ck = idx
        text = " ".join(_lines(ck, 5, f"q{ck:09x}")[:1])
    elif idx < r["c4"][1]:
        ck = idx
        text = "\n".join(_lines(ck, 9, f"q{ck:09x}", terminal=False))
    elif idx < r["neardup"][1]:
        base = idx - r["neardup"][0]
        ck = 4_000_000_000 + base // NEAR_CLUSTER
        lines = _lines(ck, 15, f"q{ck:09x}")
        # one replica-unique token spliced before the final token:
        # 31-token core shared by the cluster, J3 ≈ 0.875
        last = lines[-1].split(" ")
        last.insert(len(last) - 1, f"r{idx:x}")
        lines[-1] = " ".join(last)
        text = "\n".join(lines)
    elif idx < r["contam"][1]:
        ck = idx
        b = idx % n_bench
        phrase = " ".join(
            _word(i) for i in _bench_word_ids(b, 16)) + "."
        text = "\n".join(_lines(ck, 9, f"q{ck:09x}") + [phrase])
    else:
        ck = idx
        text = "\n".join(_lines(ck, 9, f"q{ck:09x}"))
    return doc_id, text, SOURCES[_h(idx, 77) % 4]


def _corpus_batches_factory(n_docs: int, n_bench: int):
    def gen(batches):
        import pyarrow as pa
        for batch in batches:
            rows = [doc_row(int(i), n_docs, n_bench)
                    for i in batch.column(0).to_pylist()]
            yield pa.RecordBatch.from_arrays(
                [pa.array([r[0] for r in rows], pa.string()),
                 pa.array([r[1] for r in rows], pa.string()),
                 pa.array([r[2] for r in rows], pa.string())],
                names=["doc_id", "text", "source"])
    return gen


def _bench_batches(batches):
    import pyarrow as pa
    for batch in batches:
        ids = [int(i) for i in batch.column(0).to_pylist()]
        yield pa.RecordBatch.from_arrays(
            [pa.array([f"b{b:07d}" for b in ids], pa.string()),
             pa.array([bench_text(b) for b in ids], pa.string())],
            names=["doc_id", "text"])


def generate_text_corpus(spark: SparkSession, n_docs: int,
                         out_dir: str, n_bench: int,
                         n_files: int = 256) -> str:
    (spark.range(n_docs).repartition(n_files)
     .mapInArrow(_corpus_batches_factory(n_docs, n_bench),
                 schema=CORPUS_SCHEMA)
     .write.mode("overwrite").parquet(out_dir))
    return out_dir


def generate_bench_table(spark: SparkSession, n_bench: int,
                         out_dir: str, n_files: int = 16) -> str:
    (spark.range(n_bench).repartition(n_files)
     .mapInArrow(_bench_batches, schema=BENCH_SCHEMA)
     .write.mode("overwrite").parquet(out_dir))
    return out_dir
