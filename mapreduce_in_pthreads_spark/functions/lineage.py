"""Lineage truncation for iterative plans — local by default,
reliable on demand.

Iterative operators (PageRank, connected components, BFS, the LSH
shingle-set materialization) must cut the logical plan every round or
Catalyst planning time doubles per iteration (measured in
operators/iterative.py). Two truncation modes exist:

- ``localCheckpoint(eager=True)`` — blocks are stored on the
  executors that computed them. Fastest, but a lost executor loses
  the blocks AND the lineage needed to recompute them, failing the
  job. The right default for local[] runs and short interactive jobs.
- ``checkpoint(eager=True)`` — blocks are written to the reliable
  checkpoint directory (HDFS/S3). Survives executor loss; the right
  mode for a 1000-executor cluster where *some* executor dying during
  a 10-iteration job is the expected case, not the exception.

``truncate_lineage`` picks per-session: reliable iff the session
opted in via ``spark.mapreduce_in_pthreads.reliableCheckpoint=true``
AND a checkpoint dir is set (``sc.setCheckpointDir``). Opt-in keeps
the local test/bench path free of per-iteration filesystem writes
while making the cluster-safe mode a two-line config, not a code
change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

RELIABLE_CONF = "spark.mapreduce_in_pthreads.reliableCheckpoint"


def truncate_lineage(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and return a lineage-free DataFrame."""
    spark = df.sparkSession
    if (spark.conf.get(RELIABLE_CONF, "false").lower() == "true"
            and spark.sparkContext.getCheckpointDir() is not None):
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
