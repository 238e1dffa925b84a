"""Property-based round-trips for the dependency-free xlsx codec."""
import math

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

from nail_parquet_spark.sources.xlsx import read_xlsx, write_xlsx

_SETTINGS = dict(max_examples=200, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture,
                                        HealthCheck.too_slow])

# any unicode text incl. control chars and the literal _xHHHH_ escape shape
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60
)
_cell = st.one_of(
    st.none(),
    _text,
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.booleans(),
)


@settings(**_SETTINGS)
@given(st.lists(st.tuples(_cell, _cell, _cell), min_size=0, max_size=25))
def test_xlsx_roundtrip_property(tmp_path_factory, rows):
    pdf = pd.DataFrame(rows, columns=["a", "b", "c"], dtype=object)
    path = str(tmp_path_factory.mktemp("xl") / "t.xlsx")
    write_xlsx(pdf, path)
    back = read_xlsx(path)
    if not rows:
        assert len(back) == 0
        return
    assert len(back) == len(rows)
    assert list(back.columns) == ["a", "b", "c"]
    for col_i, col in enumerate(["a", "b", "c"]):
        for row_i, want in enumerate(r[col_i] for r in rows):
            got = back[col][row_i]
            if want is None or (isinstance(want, float) and math.isnan(want)):
                assert got is None or (isinstance(got, float) and math.isnan(got)) or pd.isna(got)
            elif isinstance(want, bool):
                assert bool(got) is want
            elif isinstance(want, int):
                assert int(got) == want, (repr(want), repr(got))
            elif isinstance(want, float):
                assert float(got) == want
            else:
                assert got == want, (repr(want), repr(got))
