"""Session-level performance configuration shared by every entry point.

``PERF_CONF`` holds SQL confs that are about *how fast* plans run, never
about what they compute, so applying them is always safe.

Why ``spark.sql.codegen.hugeMethodLimit = 8000``: Spark's default limit
(65535, the JVM's hard method-size cap) only makes codegen fall back
when a generated method cannot be *loaded*. HotSpot, however, refuses to
JIT-compile any method larger than 8000 bytecode bytes
(``-XX:-DontCompileHugeMethods`` is off by default), so a fused
whole-stage method between 8000 and 65535 bytes runs in the interpreter
forever — observed here as a 6-17x slowdown on fused
explode+aggregate+join stages (near_duplicate_pairs: 86-238s default vs
13.5s with the fallback, same plan shape, same box). Aligning Spark's
fallback threshold with the JIT's real limit makes Spark split or
de-codegen exactly the stages HotSpot would never compile. This is the
tuning discussed in SPARK-21871, public knowledge.

The remaining entries bound driver-side plan/status retention for
long-lived iterative drivers (the crawl loop runs thousands of tiny
queries per session).
"""

from __future__ import annotations

PERF_CONF: dict[str, str] = {
    # keep every generated method JIT-compilable (see module docstring)
    "spark.sql.codegen.hugeMethodLimit": "8000",
    # bound driver-side retention for iterative round loops
    "spark.sql.ui.retainedExecutions": "8",
    "spark.ui.retainedJobs": "100",
    "spark.ui.retainedStages": "100",
    "spark.sql.maxPlanStringLength": "8192",
}


def apply_perf_conf(builder):
    """Apply ``PERF_CONF`` to a ``SparkSession.Builder`` (chainable)."""
    for k, v in PERF_CONF.items():
        builder = builder.config(k, v)
    return builder


def tune_session(spark) -> None:
    """Apply the runtime-settable subset to an existing session (for
    callers that receive a session they did not build, e.g. the driver
    harness calling ``__spark_entry__``)."""
    for k, v in PERF_CONF.items():
        if k.startswith("spark.sql."):
            try:
                spark.conf.set(k, v)
            except Exception:
                pass  # conf locked down by the host — purely a perf knob
