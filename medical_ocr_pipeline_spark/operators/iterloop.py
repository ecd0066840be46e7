"""Shared infrastructure for iterative DataFrame fixpoint loops.

Every iterative operator in this package (connected components,
pagerank, HITS, BFS, k-core, LPA, textrank, the WordPiece/BPE trainer
passes) has the same two needs:

1. **Per-round lineage truncation that survives executor loss.**  A
   ``localCheckpoint`` severs lineage but stores the blocks in executor
   memory/disk: on a real cluster, losing one executor mid-loop makes
   the state frame unrecomputable and kills a multi-hour job.  With a
   ``checkpoint_dir`` the truncation uses RELIABLE checkpoints written
   to cluster storage (HDFS/S3A/local) instead — the recompute-safe
   form.  Spark never deletes reliable checkpoint files on its own
   (``spark.cleaner.referenceTracking.cleanCheckpoints`` defaults to
   false), so a 20-round loop would leak 20 state snapshots; the
   rotation below keeps the newest ``keep_last`` and eagerly deletes
   older rounds.

2. **A small-graph AQE toggle that is safe under concurrency.**  AQE's
   per-query-stage materialize/re-optimize rounds cost real driver
   latency that a tiny graph pays every iteration (measured on the
   pagerank gate: 50.5 s with AQE on vs 8.6 s off, identical ranks),
   while on a billion-edge graph the same re-planning (skew split,
   coalesce) is worth every round.  ``spark.conf`` is session-global,
   so the previous hand-rolled try/finally blocks raced each other if
   two registry queries ran concurrently on one session: the second
   enter could save "false" as the value to restore.  ``aqe_disabled``
   replaces them with one lock-guarded refcount per session — the
   FIRST enter saves the real prior value, the LAST exit restores it,
   and nesting/concurrent sections compose.

This module is the shared home of the ``operators/components.py``
checkpoint pattern (VERDICT r04 next-round item #1: propagate it to
every localCheckpoint-only iterative operator).
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame


class RoundCheckpointer:
    """Per-round lineage truncation with reliable-checkpoint rotation.

    With ``checkpoint_dir`` set, each :meth:`truncate` call eagerly
    checkpoints the frame under ``{checkpoint_dir}/{name}/round_{i}``
    and deletes rounds older than the newest ``keep_last``.  Without a
    dir (single-JVM local mode / tests, where executors cannot be lost
    independently of the driver) it falls back to ``localCheckpoint``,
    which is faster and equally safe there.

    ``keep_last`` defaults to 2, not 1, because the step that
    *materializes* round ``i`` is usually not its last reader: the
    convergence count of connected components reads round ``i-1`` after
    round ``i`` lands, and HITS's final join reads the last TWO
    checkpoints (auth and hub).  Callers whose returned frame is backed
    by the single newest round call :meth:`finish` before returning to
    prune to exactly one snapshot on storage.

    The final round's files back the returned DataFrame and must
    outlive it: the caller of the operator owns deleting
    ``checkpoint_dir`` after consuming the result.  ``setCheckpointDir``
    is global to the SparkContext; :meth:`restore` (run by the context
    manager exit, surviving mid-loop failures) puts back the previous
    checkpoint dir, but when none was set the last round's subdir
    necessarily remains the context's checkpoint dir.  Note:
    ``setCheckpointDir`` appends a random UUID, so the restored path is
    the prior dir's UUID-resolved form and re-setting it nests one more
    UUID level under the original — functionally sound (later
    checkpoints still land under the caller's original base), just one
    directory deeper per pass through this path.
    """

    def __init__(self, spark, checkpoint_dir: str | None = None,
                 name: str = "rounds", keep_last: int = 2):
        self._sc = spark.sparkContext
        self._base: str | None = None
        self._restore_dir: str | None = None
        self._live: list[int] = []
        self._step = 0
        self._keep = max(1, keep_last)
        if checkpoint_dir is not None:
            self._base = checkpoint_dir.rstrip("/") + "/" + name
            self._restore_dir = self._sc.getCheckpointDir()

    # -- context manager: restore the context's checkpoint dir on ANY
    # exit path (including non-convergence errors and Spark failures)
    def __enter__(self) -> "RoundCheckpointer":
        return self

    def __exit__(self, *exc) -> None:
        self.restore()

    def truncate(self, df: DataFrame) -> DataFrame:
        """Eagerly checkpoint ``df`` as the next round's state and
        reclaim rounds older than the newest ``keep_last``."""
        step = self._step
        self._step += 1
        if self._base is None:
            return df.localCheckpoint(eager=True)
        self._sc.setCheckpointDir(f"{self._base}/round_{step}")
        out = df.checkpoint(eager=True)
        self._live.append(step)
        while len(self._live) > self._keep:
            self._drop(self._live.pop(0))
        return out

    def finish(self, keep: int = 1) -> None:
        """Prune retained rounds down to the newest ``keep`` once the
        loop is done and older rounds have no readers left (the
        returned frame reads only its own checkpoint files — a
        checkpoint severs lineage)."""
        while len(self._live) > keep:
            self._drop(self._live.pop(0))

    def restore(self) -> None:
        if self._restore_dir is not None:
            self._sc.setCheckpointDir(self._restore_dir)
            self._restore_dir = None

    def _drop(self, step: int) -> None:
        """Delete one round's checkpoint subdir via the Hadoop FS API
        (works for HDFS/S3A/local alike, unlike os-level removal)."""
        jpath = self._sc._jvm.org.apache.hadoop.fs.Path(
            f"{self._base}/round_{step}"
        )
        fs = jpath.getFileSystem(self._sc._jsc.hadoopConfiguration())
        fs.delete(jpath, True)


_AQE_CONF = "spark.sql.adaptive.enabled"
_AQE_LOCK = threading.Lock()
# session-keyed refcount: {id(session): [depth, saved_value, session]}
# (the session reference in the value pins the object so id() cannot be
# reused while a section is active; entries are removed at depth 0)
_AQE_STATE: dict[int, list] = {}


@contextmanager
def aqe_disabled(spark, disable: bool = True):
    """Refcounted, lock-guarded "AQE off" section over a session.

    ``disable=False`` makes it a no-op (the ``aqe='on'`` / large-graph
    path), so call sites can compute the policy once and always enter
    the guard.  Concurrent or nested sections on the same session
    compose: the first enter records the session's real prior value and
    sets ``false``; the last exit restores that recorded value.  This
    replaces per-operator try/finally blocks that could race (second
    enter saving "false" as the restore value → AQE permanently off).

    Limitation (documented, inherent to session-global conf): a
    concurrent query on the SAME session that does *not* use this guard
    still observes AQE off while any section is active.  Queries that
    need AQE concurrently should run on ``spark.newSession()``.
    """
    if not disable:
        yield
        return
    key = id(spark)
    with _AQE_LOCK:
        st = _AQE_STATE.get(key)
        if st is None:
            _AQE_STATE[key] = [1, spark.conf.get(_AQE_CONF), spark]
            spark.conf.set(_AQE_CONF, "false")
        else:
            st[0] += 1
    try:
        yield
    finally:
        with _AQE_LOCK:
            st = _AQE_STATE[key]
            st[0] -= 1
            if st[0] == 0:
                spark.conf.set(_AQE_CONF, st[1])
                del _AQE_STATE[key]
