"""Text-analysis building blocks for the training-data pipeline:
tokenization, shingling, MinHash, SimHash, language-ID markers, quality
stats. All pure Catalyst expressions (split/transform/slice/md5) — the
hot path stays JVM-side; each helper has a DuckDB SQL mirror for oracle
construction.

Hash-function choice: MinHash/SimHash need a keyed hash that exists
bit-identically in both engines. xxhash64 (Spark) has no DuckDB
counterpart, so the base hash is md5 (identical everywhere); MinHash
then applies a universal affine family over GF(2^31-1) to the md5
prefix — one digest per shingle, K integer mixes, BIGINT signatures
(8x fewer digests and ~5x fewer shuffle bytes than one md5 hex string
per (shingle, index)).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: whitespace tokenizer — shared by Spark and oracle mirrors
TOKEN_SPLIT_RE = r"\s+"
#: BPE-ish fallback tokenizer: letter runs, digit runs, single symbols
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"

EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

#: tiny per-language marker lexicons for the n-gram/stopword-style
#: language-ID heuristic (deterministic argmax with fixed priority)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "los", "un"),
    "fr": ("le", "les", "des", "un", "et"),
    "de": ("der", "die", "das", "und", "ein"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),  # pinyin-ish markers
}


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), TOKEN_SPLIT_RE)


def tokens_sql(text: str) -> str:
    return f"regexp_split_to_array(trim({text}), '{TOKEN_SPLIT_RE}')"


def shingles(toks: Column, k: int = 5) -> Column:
    """Word k-grams as space-joined strings; empty array when the doc is
    shorter than k tokens. The short-doc branch must be explicit:
    Spark's sequence(1, 0) DESCENDS (yielding [1, 0] and a
    slice(toks, 0, k) runtime error), unlike DuckDB's empty
    generate_series(1, 0) — the guard keeps both engines at []."""
    n = F.size(toks)
    return F.when(
        n >= F.lit(k),
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles_sql(arr: str, k: int = 5) -> str:
    return (
        f"list_transform(generate_series(1, greatest(len({arr}) - {k - 1}, 0)),"
        f" i -> array_to_string({arr}[i:i + {k - 1}], ' '))"
    )


#: Universal-hash family over a Mersenne-prime field: one md5 per
#: shingle (the expensive part), then K cheap integer mixes
#: h_i = (A_i·base + B_i) mod p — 8× fewer digest computations than
#: md5-per-(shingle, index), identical integers in every engine
#: (exact 64-bit arithmetic, no overflow: A_i, base < 2³¹ ⇒ product
#: < 2⁶²).
MINHASH_P = 2_147_483_647  # 2³¹ − 1
_MINHASH_A = (999_983, 611_953, 479_909, 363_563, 262_147, 131_101,
              65_537, 32_771, 16_411, 8_209, 4_099, 2_053)
_MINHASH_B = (15_485_863, 9_999_991, 6_700_417, 4_256_233, 2_097_593,
              1_299_709, 611_957, 104_729, 65_539, 32_779, 16_417, 8_219)


def minhash_value(shingle: Column, hash_idx: int) -> Column:
    """Keyed hash for MinHash: 60 bits of md5(shingle) reduced mod p,
    then the ``hash_idx``-th affine mix. The signature component is
    MIN of this BIGINT per doc."""
    base = F.conv(F.substring(F.md5(shingle), 1, 15), 16, 10).cast(
        "bigint"
    ) % MINHASH_P
    a, b = _MINHASH_A[hash_idx], _MINHASH_B[hash_idx]
    return (base * F.lit(a) + F.lit(b)) % MINHASH_P


def minhash_value_sql(shingle: str, hash_idx: int) -> str:
    a, b = _MINHASH_A[hash_idx], _MINHASH_B[hash_idx]
    base = (
        f"(CAST(('0x' || substr(md5({shingle}), 1, 15)) AS BIGINT)"
        f" % {MINHASH_P})"
    )
    return f"(({base} * {a} + {b}) % {MINHASH_P})"


def stopword_hits(toks: Column, words=EN_STOPWORDS) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def stopword_hits_sql(arr: str, words=EN_STOPWORDS) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({arr}, t -> t IN ({lst})))"


def simhash_bit_sums(token: Column, cnt: Column, n_bits: int = 16) -> list[Column]:
    """SimHash: per token, bit i of md5(token) votes ±count. Returns the
    n_bits signed-sum aggregate expressions (caller groups by doc)."""
    h = F.md5(token)
    sums = []
    for i in range(n_bits):
        bit_on = F.substring(h, i + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f")
        sums.append(
            F.sum(F.when(bit_on, cnt).otherwise(-cnt)).alias(f"_s{i}")
        )
    return sums


def simhash_from_sums(n_bits: int = 16) -> Column:
    """Assemble the fingerprint: bit i set iff the signed sum is > 0
    (ties → 0, deterministic)."""
    out = F.lit(0).cast("long")
    for i in range(n_bits):
        out = out + F.when(F.col(f"_s{i}") > 0, F.lit(2 ** i)).otherwise(0).cast("long")
    return out


def simhash_sql(token: str, cnt: str, n_bits: int = 16) -> tuple[str, str]:
    """(per-bit sum select list, fingerprint expression) mirrors."""
    sums = ", ".join(
        f"sum(CASE WHEN substring(md5({token}), {i + 1}, 1) IN "
        f"('8','9','a','b','c','d','e','f') THEN {cnt} ELSE -{cnt} END) AS _s{i}"
        for i in range(n_bits)
    )
    fp = " + ".join(
        f"(CASE WHEN _s{i} > 0 THEN {2 ** i} ELSE 0 END)" for i in range(n_bits)
    )
    return sums, f"CAST({fp} AS BIGINT)"
