"""Property-based codec round-trip (hypothesis): arbitrary nested
document trees survive sanitise -> Spark write -> read back, with the
documented coercions (tuple/set -> list, keys -> str, utf-8 bytes -> str,
non-utf8 -> binary, NaN/Inf -> null) applied deterministically."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from topic_store_spark.codec import sanitise_dict

# scalars the reference's type lattice covers
scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=True, allow_infinity=True, width=64),
    st.text(max_size=20),
    st.binary(max_size=20),
)

trees = st.recursive(
    scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(
            st.one_of(st.text(max_size=8), st.integers(-99, 99)), children, max_size=4
        ),
        st.tuples(children, children),
        st.sets(st.integers(-99, 99), max_size=4),
    ),
    max_leaves=20,
)


def expected(value):
    """The documented coercion, applied independently of the codec."""
    if isinstance(value, float) and (math.isnan(value) or math.isinf(value)):
        return None
    if isinstance(value, bytes):
        try:
            return value.decode("utf-8")
        except UnicodeDecodeError:
            return bytearray(value)
    if isinstance(value, dict):
        return {str(k): expected(v) for k, v in value.items()}
    if isinstance(value, tuple):
        return [expected(v) for v in value]
    if isinstance(value, (set, frozenset)):
        return [expected(v) for v in sorted(value, key=repr)]
    if isinstance(value, list):
        return [expected(v) for v in value]
    return value


@given(doc=st.dictionaries(st.text(max_size=8), trees, max_size=5))
@settings(max_examples=200, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_sanitise_matches_documented_coercions(doc):
    assert sanitise_dict(doc) == expected(doc)


@given(doc=st.dictionaries(st.text(max_size=8), trees, min_size=1, max_size=3))
@settings(max_examples=50, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_sanitise_idempotent(doc):
    once = sanitise_dict(doc)
    assert sanitise_dict(once) == once
