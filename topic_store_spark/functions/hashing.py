"""Portable hashing primitives for dedup/fingerprinting.

Everything derives from md5 hex strings because md5 is bit-identical in
Spark and DuckDB (and everywhere else), which makes MinHash/SimHash
signatures — normally engine-specific — exactly reproducible by the SQL
oracle:

- MinHash permutation i  = min over shingles of md5("i:" + shingle);
  lexicographic min of equal-length hex strings == numeric min.
- SimHash bit i          = majority over tokens of (low bit of hex digit
  i of md5(token)); a hex digit is odd iff it's in "13579bdf".

All expressions are built-in column functions — signatures compute
JVM-side inside whole-stage codegen, one md5 per (shingle, permutation).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ODD_HEX = "13579bdf"


def md5_fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text."""
    from topic_store_spark.functions.text import normalize_text

    return F.md5(normalize_text(col))


def _perm_min(shingles: Column, seed: int) -> Column:
    # NB: the lambda must take exactly one parameter — F.transform passes
    # the array index as a second argument if the callable accepts two,
    # which would silently override a default-arg closure.
    prefix = f"{seed}:"
    return F.array_min(
        F.transform(shingles, lambda s: F.md5(F.concat(F.lit(prefix), s)))
    )


def minhash_signature(shingles: Column, k: int = 12) -> Column:
    """Array of k MinHash values (32-hex strings).  Empty shingle sets
    produce NULL elements — filter empties upstream."""
    return F.array(*[_perm_min(shingles, i) for i in range(k)])


def lsh_band_keys(signature: Column, bands: int, rows: int) -> Column:
    """Split a k=bands*rows signature into band bucket keys
    ('<band>|<concat of row hashes>')."""
    return F.array(
        *[
            F.concat(
                F.lit(f"{b}|"),
                F.concat_ws("", F.slice(signature, b * rows + 1, rows)),
            )
            for b in range(bands)
        ]
    )


MERSENNE31 = (1 << 31) - 1


def mix_constants(k: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs for the universal-hash MinHash
    family, derived from md5 so Python (plan build), Spark (literals in
    the plan) and the DuckDB oracle (literals in the SQL string) all see
    identical constants.  a_i is forced odd and both are reduced mod
    2^31-1 so a_i * x never overflows a signed 64-bit integer for
    28-bit x."""
    import hashlib

    out = []
    for i in range(k):
        a = int(hashlib.md5(f"a:{i}".encode()).hexdigest()[:7], 16) | 1
        b = int(hashlib.md5(f"b:{i}".encode()).hexdigest()[:7], 16)
        out.append(((a % MERSENNE31) or 1, b % MERSENNE31))
    return out


def shingle_keys(shingles: Column) -> Column:
    """28-bit integer key per shingle: first 7 md5 hex digits.  ONE md5
    per shingle — the k permutation values are derived from this key by
    cheap integer mixing (``minhash_signature_from_keys``), versus the
    k-md5s-per-shingle cost of ``minhash_signature``.  Materialize this
    with its own ``select`` before building signatures (perf contract:
    see text.shingles_from_tokens)."""
    return F.transform(
        shingles, lambda s: F.conv(F.substring(F.md5(s), 1, 7), 16, 10).cast("long")
    )


def shingle_key60(col: Column) -> Column:
    """60-bit integer key (first 15 md5 hex digits) — the join-key form
    of a shingle for the exact-overlap self-join family: collision odds
    are negligible at any corpus size (~3e-4 expected collisions at 1e9
    distinct shingles) and a long shuffles ~3x smaller than a word
    3-gram string.  DuckDB twin:
    ``CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)``."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_signature_from_keys(keys: Column, k: int = 12) -> Column:
    """Array of k MinHash values (longs) from a *materialized* shingle
    key array: perm i is ``min over keys of (a_i * x + b_i) mod 2^31-1``
    — a multiply-shift universal hash whose arithmetic is exact and
    identical in any engine with 64-bit signed integers (operands stay
    < 2^59; no overflow, no negative mod).  ~k× cheaper than the md5
    family: the md5 work is one pass in ``shingle_keys``, the k
    permutations are integer ops inside whole-stage codegen."""
    consts = mix_constants(k)

    # NB: the lambda must take exactly ONE parameter (see _perm_min note)
    # — default-arg closures would make F.transform bind it as a
    # multi-arg (value, index) lambda, so constants ride a factory.
    def _perm(a: int, b: int):
        return lambda x: (x * F.lit(a) + F.lit(b)) % F.lit(MERSENNE31)

    return F.array(
        *[F.array_min(F.transform(keys, _perm(a, b))) for a, b in consts]
    )


def lsh_band_keys_int(signature: Column, bands: int, rows: int) -> Column:
    """Band bucket keys ('<band>|<comma-joined row values>') over an
    integer MinHash signature."""
    return F.array(
        *[
            F.concat(
                F.lit(f"{b}|"),
                F.array_join(
                    F.transform(
                        F.slice(signature, b * rows + 1, rows),
                        lambda v: v.cast("string"),
                    ),
                    ",",
                ),
            )
            for b in range(bands)
        ]
    )


def token_md5s(token_array: Column) -> Column:
    """md5 hex of every token — materialize this with its own ``select``
    before ``simhash_bits_from_hashes`` (perf contract: see
    text.shingles_from_tokens)."""
    return F.transform(token_array, lambda t: F.md5(t))


def simhash_bits_from_hashes(hashes: Column, bits: int = 32) -> Column:
    """SimHash fingerprint as a `bits`-char '0'/'1' string from a
    *materialized* token-md5 array column (bit i from hex digit i of each
    token's md5; majority vote, ties -> 0).  ``hashes`` must be a plain
    attribute: each bit filters the array once, so an inline md5 transform
    would be re-evaluated ``bits`` times."""
    if bits > 32:
        raise ValueError("md5 hex has 32 digits; bits must be <= 32")
    n = F.size(hashes)

    def _ones_at(pos: int) -> Column:
        # single-parameter lambda: see _perm_min note on F.transform/filter
        return F.size(
            F.filter(
                hashes,
                lambda h: F.instr(F.lit(ODD_HEX), F.substring(h, pos + 1, 1)) > 0,
            )
        )

    bit_cols = [
        F.when(_ones_at(i) * 2 > n, F.lit("1")).otherwise(F.lit("0"))
        for i in range(bits)
    ]
    return F.concat(*bit_cols)


def simhash_bits(token_array: Column, bits: int = 32) -> Column:
    """Single-expression SimHash (convenience; operators should stage
    ``token_md5s`` through a projection first)."""
    return simhash_bits_from_hashes(token_md5s(token_array), bits)


def simhash_long_from_hashes(hashes: Column, bits: int = 32) -> Column:
    """SimHash fingerprint as a LONG (bit i of the result = majority over
    tokens of the low bit of hex digit i of md5(token) — same bit values
    as ``simhash_bits_from_hashes``, packed little-endian).

    The integer representation is the scale path: band keys are shifts,
    Hamming distance is ``bit_count(a ^ b)`` — whole-stage-codegen
    arithmetic instead of per-character interpreted lambdas on the
    (candidate-pair-sized!) verify side.

    Single-pass layout: each md5 is reduced to a 0/1 parity string with
    ONE native ``translate`` (hex digit odd <=> low bit set), then one
    ``aggregate`` folds all parity strings into 32 per-bit counters via
    ``zip_with``.  This replaces the previous 32-traversal form (one
    ``filter`` per bit) — ~2x faster measured at sf0.1 and O(tokens)
    instead of O(32*tokens) array walks per document."""
    if bits > 32:
        raise ValueError("md5 hex has 32 digits; bits must be <= 32")
    n = F.size(hashes)
    parities = F.transform(
        hashes, lambda h: F.translate(h, "0123456789abcdef", "0101010101010101")
    )
    # split("(?!^)") yields one element per char plus a trailing ""; the
    # slice keeps exactly the `bits` leading digit parities.
    counts = F.aggregate(
        parities,
        F.array_repeat(F.lit(0), bits),
        lambda acc, p: F.zip_with(
            acc,
            F.slice(F.split(p, "(?!^)"), 1, bits),
            lambda a, c: a + c.cast("int"),
        ),
    )
    # pow(2, i) is exact in double for i <= 52, so the long cast is safe.
    weights = F.transform(
        counts,
        lambda c, i: F.when(
            c * 2 > n, F.pow(F.lit(2.0), i).cast("long")
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(weights, F.lit(0).cast("long"), lambda acc, x: acc + x)


ROLLING_BASE = 257
ROLLING_MOD = (1 << 31) - 1  # Mersenne prime; keeps acc*base+v < 2^40


def rolling_fingerprint(token_array: Column) -> Column:
    """Polynomial rolling-hash document fingerprint over the token stream:
    ``h = (h * 257 + tokval) mod (2^31 - 1)`` with ``tokval`` = first 8
    md5 hex digits of the token as an integer.

    Unlike the order-insensitive md5 fingerprint, this is sensitive to
    token *order* (a shuffled document hashes differently).  Bounded
    modular arithmetic — no overflow, bit-identical in any engine with
    64-bit integers; the DuckDB twin is a ``list_reduce``."""
    vals = F.transform(
        token_array,
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
    )
    return F.aggregate(
        vals,
        F.lit(0).cast("long"),
        lambda acc, v: (acc * ROLLING_BASE + v) % ROLLING_MOD,
    )


def simhash_long_band_keys(sim: Column, bits: int = 32, band_bits: int = 8) -> Column:
    """Integer band bucket keys over a packed simhash long: key =
    band_index * 2^band_bits + the band's bit slice."""
    bands = bits // band_bits
    mask = (1 << band_bits) - 1
    return F.array(
        *[
            (F.lit(b * (mask + 1)).cast("long"))
            + F.shiftright(sim, b * band_bits).bitwiseAND(F.lit(mask))
            for b in range(bands)
        ]
    )


def hamming_distance(bits_a: Column, bits_b: Column, bits: int = 32) -> Column:
    """Hamming distance between two equal-length bit strings."""
    return F.size(
        F.filter(
            F.sequence(F.lit(1), F.lit(bits)),
            lambda i: F.substring(bits_a, i, 1) != F.substring(bits_b, i, 1),
        )
    )


def simhash_band_keys(bits_col: Column, bits: int = 32, band_bits: int = 8) -> Column:
    """Band bucket keys over a simhash bit string: equal band => candidate."""
    bands = bits // band_bits
    return F.array(
        *[
            F.concat(
                F.lit(f"{b}|"), F.substring(bits_col, b * band_bits + 1, band_bits)
            )
            for b in range(bands)
        ]
    )
