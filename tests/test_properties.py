"""Property-based checks (SURVEY.md §5.2 item 4) on the pure-Python
DAG runner — fast to fuzz because no SparkSession is involved."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from prox_spark.pipeline import Pipeline

# a random DAG: for stage i, an optional dependency on some j < i, and
# a flag saying whether the stage itself fails
dag_strategy = st.lists(
    st.tuples(st.one_of(st.none(), st.integers(min_value=0, max_value=50)),
              st.booleans()),
    min_size=1,
    max_size=12,
)


@given(dag_strategy)
@settings(max_examples=200, deadline=None)
def test_runner_invariants(spec):
    p = Pipeline()
    for i, (dep, fails) in enumerate(spec):
        deps = [f"s{dep}"] if dep is not None and dep < i else []

        def fn(ctx, i=i, fails=fails):
            if fails:
                raise RuntimeError(f"boom {i}")
            return i

        p.add_stage(f"s{i}", fn, depends_on=deps, max_attempts=1, backoff_seconds=0)
    results = p.run()

    assert set(results) == {f"s{i}" for i in range(len(spec))}
    for i, (dep, fails) in enumerate(spec):
        r = results[f"s{i}"]
        if dep is not None and dep < i and results[f"s{dep}"].status != "succeeded":
            # dependency not satisfied -> never executed
            assert r.status == "skipped" and r.attempts == 0
        elif fails:
            assert r.status == "failed"
        else:
            assert r.status == "succeeded" and r.output == i
