"""Fixed-point embedding scaling: float32-vs-double boundary audit.

The embedding parquet column is float32. DuckDB evaluates
`x * 1000 + 0.5` with the product IN float32 (then promotes), while
Spark and operators/similarity.int_embedding compute it in double —
for boundary components (e.g. -0.2345f, whose float32 product is
exactly -234.5 but whose double product is -234.0000006) the floored
fixed-point value differs by 1. Round 10 found two such components at
sf0.1 (vec 1687 dim 39, vec 1879 dim 17) diverging the kmeans inertia;
clustering._DD_EI now casts to DOUBLE explicitly.

Three oracle strings still use the bare float32 form
(queries/similarity.DD_EI, queries/similarity2._DD_HN_EI, the k-center
oracle in queries/sampling.py). Their gates stay exact because the
DRIVER's scale factors carry no boundary components — this test pins
exactly that, so if the testdata ever changes (or anyone points the
gate at sf0.1 without aligning those strings) the assumption fails
loudly here instead of as an inscrutable hash mismatch.
"""

from __future__ import annotations

import duckdb
import pytest

_BOUNDARY_COUNT_SQL = """
    SELECT COUNT(*) FROM (
      SELECT unnest(list_transform(embedding,
               x -> CAST(FLOOR(x * 1000 + 0.5) AS BIGINT))) AS f32_scaled,
             unnest(list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))) AS f64_scaled
      FROM read_parquet($path)
    ) WHERE f32_scaled <> f64_scaled
"""


def _boundary_count(sf_dir: str) -> int:
    con = duckdb.connect()
    return con.execute(
        _BOUNDARY_COUNT_SQL, {"path": f"{sf_dir}/embeddings.parquet"}
    ).fetchone()[0]


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_gate_scale_factors_have_no_boundary_components(sf_dir):
    assert _boundary_count(sf_dir) == 0, (
        "float32-sensitive embedding components appeared at a gate SF: "
        "align the remaining bare `x * 1000` oracle strings "
        "(similarity.DD_EI, similarity2._DD_HN_EI, sampling k-center) "
        "with clustering._DD_EI's CAST(x AS DOUBLE) form"
    )


def test_audit_detects_the_known_sf01_boundaries():
    """The audit must itself be sensitive: sf0.1 carries exactly the
    two components that diverged the kmeans gate before the fix."""
    assert _boundary_count("/root/testdata/sf0.1") == 2


_ZERO_NORM_SQL = """
    SELECT COUNT(*) FROM read_parquet($path)
    WHERE len(list_filter(embedding,
          x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT) <> 0)) = 0
"""


@pytest.mark.parametrize(
    "sf_dir",
    ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"],
)
def test_no_zero_norm_embedding_at_gate_sfs(sf_dir):
    """SemDeDup's cosine divides by norm products with no zero guard
    (ADVICE r10): an all-zero SCALED embedding would make Spark emit
    NaN->NULL (row silently filtered) while DuckDB's
    CAST(FLOOR(NaN) AS BIGINT) errors the whole oracle query — a latent
    engine/oracle divergence. Pin that the hazard's precondition does
    not exist in any gate corpus; if the testdata ever changes, this
    fails loudly instead of as an inscrutable oracle error."""
    con = duckdb.connect()
    n = con.execute(
        _ZERO_NORM_SQL, {"path": f"{sf_dir}/embeddings.parquet"}
    ).fetchone()[0]
    assert n == 0, (
        f"{n} zero-norm scaled embeddings at {sf_dir}: add a norm > 0 "
        "guard to semdedup_members_and_dups AND its oracle before "
        "trusting the gate"
    )
