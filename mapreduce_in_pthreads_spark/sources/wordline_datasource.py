"""A Python Data Source (Spark 4 ``pyspark.sql.datasource`` API) for
the reference's word-per-line corpus format — the reference engine's
input contract (one producer per ``testfiles/fileN.txt``, byte-faithful
reads, per-file 1-based line numbers; mapreduce.c:97-138) expressed as
a first-class ``spark.read.format("wordline")`` source.

Fidelity contract (same as ``sources/text.py``, which stays the hot
path — binaryFile + expressions beats Python-per-row):
- bytes decode Latin-1 (1:1 byte→char like the C buffer) so a UTF-8
  BOM survives as content instead of being stripped;
- ``linenum`` is the 1-based physical ordinal, assigned to EVERY line
  including ones later dropped as empty (mapreduce.c:109 increments
  before the 112-114 skip);
- a single trailing newline yields no phantom final line (fgets
  semantics); CRLF line ends keep their ``\\r`` in ``raw_line``.

Scale notes: one InputPartition per file = the reference's map-side
DOP (``-p`` spawns one producer per file, mapreduce.c:307-313); Spark
schedules the partitions across executors. Missing files are skipped
like the reference's no-op producer (mapreduce.c:100-103).
"""

from __future__ import annotations

import glob
import os
from collections.abc import Iterator, Sequence

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

WORDLINE_SCHEMA = "filename string, linenum int, raw_line string"


def _expand(path: str) -> list[str]:
    """Dir → its files; glob → matches; plain path → itself if it
    exists (missing → skipped, the reference's no-op producer)."""
    if os.path.isdir(path):
        return sorted(
            p for p in glob.glob(os.path.join(path, "*")) if os.path.isfile(p))
    matches = sorted(p for p in glob.glob(path) if os.path.isfile(p))
    return matches


class WordLineReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("wordline source requires a path, e.g. "
                             "spark.read.format('wordline').load(dir)")
        self._files = _expand(path)

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per file == one reference producer per file
        return [InputPartition(f) for f in self._files]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        yield from _read_file(partition.value)


def _read_file(path: str) -> Iterator[tuple]:
    """Shared fgets-faithful per-file record iterator (R1-R3)."""
    with open(path, "rb") as fh:
        text = fh.read().decode("latin-1")
    lines = text.split("\n")
    if text.endswith("\n"):
        lines = lines[:-1]              # fgets: no phantom final line
    for linenum, raw in enumerate(lines, start=1):
        yield (path, linenum, raw)


class WordLineStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin of the batch reader: the corpus arrives one FILE
    per micro-batch, in sorted filename order — the Structured
    Streaming analogue of the reference spawning one producer per file
    (mapreduce.c:307-313), re-expressed as a replayable source. The
    offset is simply the index of the next unread file, so
    ``readBetweenOffsets`` replays any batch exactly (the contract
    checkpoint recovery depends on); files appearing after the stream
    starts are picked up because the listing re-expands on every
    ``read`` call. A production source would track (file, mtime)
    watermarks the way FileStreamSource does; the index offset is
    enough for an immutable corpus."""

    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("wordline stream requires a path")
        self._path = path

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def read(self, start: dict):
        files = _expand(self._path)
        i = int(start["idx"])
        if i >= len(files):
            return iter(()), start      # caught up; offset unchanged
        # iter(list), not a bare generator or list: the prefetch cache
        # copy.copy()s the iterator for replay (generators can't be
        # copied) and next()s it on the empty-batch path (lists aren't
        # iterators)
        return iter(list(_read_file(files[i]))), {"idx": i + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
        files = _expand(self._path)
        out: list[tuple] = []
        for i in range(int(start["idx"]), int(end["idx"])):
            if i < len(files):
                out.extend(_read_file(files[i]))
        return out


@dataclass
class _WordLineCommit(WriterCommitMessage):
    tmp_path: str
    final_path: str
    n_lines: int


class WordLineWriter(DataSourceWriter):
    """Two-phase-commit writer for the word-per-line format — the
    reference's sink contract (R11: each reducer emits its whole
    output atomically under ``printmutex``, mapreduce.c:216-222, and
    the STRICT ``file<i>.txt`` naming is part of the format,
    mapreduce.c:309) as a real ``df.write.format("wordline")`` sink:

    - each task attempt writes its partition to a hidden
      ``.file<i>.txt.tmp-<taskAttemptId>`` (one file per partition =
      the per-reducer atomic block; i = partitionId + 1 matches the
      reader/reference naming). The attempt id in the name is what
      makes this FileOutputCommitter-v1-safe: a speculated or retried
      attempt racing a zombie writes a DIFFERENT temp, so no attempt
      can interleave with or truncate another's bytes;
    - ``commit`` (driver, after ALL tasks succeed) renames exactly the
      temp named in each WINNING attempt's commit message into place —
      publish-by-rename, so a failed/speculated task can never leave a
      half-written visible file. Loser-attempt temps are swept
      best-effort afterwards;
    - ``abort`` deletes the temps.

    Save modes: ``overwrite`` first clears every existing
    ``file<i>.txt`` in the target (a prior write with MORE partitions
    leaves no stale tail files); ``append`` is accepted only when the
    target holds no ``file<i>.txt`` yet — the strict naming contract
    has no well-defined append (file1.txt would silently clobber), so
    appending onto a non-empty corpus raises instead.

    Rows: the FIRST column, cast to str, becomes the line; bytes are
    Latin-1 (1:1 char→byte, the reader's decode mirrored).
    """

    def __init__(self, options: dict, overwrite: bool) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("wordline sink requires a path")
        self._dir = path
        self._overwrite = overwrite

    def write(self, iterator) -> _WordLineCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        attempt = ctx.taskAttemptId()
        os.makedirs(self._dir, exist_ok=True)
        final = os.path.join(self._dir, f"file{pid + 1}.txt")
        tmp = os.path.join(self._dir, f".file{pid + 1}.txt.tmp-{attempt}")
        n = 0
        with open(tmp, "wb") as fh:
            for row in iterator:
                fh.write(str(row[0]).encode("latin-1") + b"\n")
                n += 1
        return _WordLineCommit(tmp_path=tmp, final_path=final, n_lines=n)

    def commit(self, messages) -> None:
        existing = glob.glob(os.path.join(self._dir, "file*.txt"))
        if self._overwrite:
            for path in existing:
                os.remove(path)
        elif existing:
            raise ValueError(
                "wordline sink: append onto a non-empty corpus is not "
                f"supported ({len(existing)} file<i>.txt already in "
                f"{self._dir}); use mode('overwrite') or a fresh path")
        for m in messages:
            os.replace(m.tmp_path, m.final_path)
        # best-effort sweep of loser-attempt temps (zombie/speculated
        # attempts whose commit message never reached the driver)
        for stale in glob.glob(os.path.join(self._dir, ".file*.txt.tmp-*")):
            try:
                os.remove(stale)
            except FileNotFoundError:
                pass

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.tmp_path)
            except FileNotFoundError:
                pass


class WordLineDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "wordline"

    def schema(self) -> str:
        return WORDLINE_SCHEMA

    def reader(self, schema) -> WordLineReader:
        return WordLineReader(self.options)

    def simpleStreamReader(self, schema) -> WordLineStreamReader:
        return WordLineStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> WordLineWriter:
        return WordLineWriter(self.options, overwrite)


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(WordLineDataSource)
