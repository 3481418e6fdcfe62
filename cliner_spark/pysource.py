"""PySpark-4 Python DataSource connectors (pyspark.sql.datasource).

Two first-class Spark formats, registered via :func:`register_sources`:

- ``"i2b2"`` — the reference's on-disk corpus layout (paired ``.txt``/``.con``
  record files; SURVEY.md S1/S2/S4, reference analog code/documents.py read
  ~L20-120 / con parse ~L230-300 / write ~L300-360, approx/unverified §0)
  exposed as a real Spark format instead of ad-hoc loader functions:

      spark.read.format("i2b2").option("mode", "turns").load(dir)
      spark.read.format("i2b2").option("mode", "mentions").load(dir)
      mentions.repartition("conv_id").write.format("i2b2").save(dir)

  Semantics are IDENTICAL to sources.read_i2b2_docs / read_i2b2_cons /
  con_format.format_con_lines (tests assert row equality): one file = one
  conversation (conv_id = filename stem), turn_idx = 0-based physical line
  index, blank lines dropped, .con grammar per con_format.CON_RE with
  malformed / cross-line records skipped.

- ``"transcript_stream"`` — a replayable deterministic synthetic transcript
  micro-batch source with EXACTLY the north-rule input shape
  (conv_id, turn_idx, role, text, tool, ts). Offsets are global row indices
  and every row is a pure function of its index, so checkpoint recovery and
  readBetweenOffsets replay are exactly-once by construction (the property
  Structured Streaming requires of a source; Kafka gives it via log offsets,
  we give it via determinism).

Scale notes: partition planning for "i2b2" is by file groups — the driver
lists the directory once, executors open only their own files, and one file
never splits across partitions (turn order within a conversation is
structural, which the per-turn ordering invariant requires). At 100 TB the
same planner runs over an object-store listing; numPartitions bounds task
count. The .con writer requires each conv_id to be wholly inside one task
(``repartition("conv_id")`` upstream — enforced note in write_con_dir),
otherwise two tasks would race on the same output file.
"""

from __future__ import annotations

import glob as _glob
import hashlib
import os
import re
from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Iterator, Sequence, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StructType

# Python twin of con_format.CON_RE (same published i2b2/VA 2010 grammar).
_CON_RE = re.compile(r'^c="([^"]*)" (\d+):(\d+) (\d+):(\d+)\|\|t="([^"]*)"$')

TURNS_SCHEMA = "conv_id string, turn_idx int, text string"
MENTIONS_SCHEMA = (
    "conv_id string, turn_idx int, tok_start int, tok_end int, "
    "mention_text string, concept_type string"
)
STREAM_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


@dataclass
class FileGroupPartition(InputPartition):
    files: Tuple[str, ...]


class _I2b2Reader(DataSourceReader):
    def __init__(self, path: str, mode: str, num_partitions: int) -> None:
        ext = "txt" if mode == "turns" else "con"
        pattern = path if _glob.has_magic(path) else os.path.join(path, f"*.{ext}")
        self._files = tuple(sorted(_glob.glob(pattern)))
        self._mode = mode
        self._n = max(1, min(num_partitions, len(self._files) or 1))

    def partitions(self) -> Sequence[InputPartition]:
        # Round-robin over the sorted listing: adjacent (similar-sized)
        # files spread across tasks instead of one task taking a hot run.
        groups = [self._files[i :: self._n] for i in range(self._n)]
        return [FileGroupPartition(tuple(g)) for g in groups if g]

    def read(self, partition: FileGroupPartition) -> Iterator[Tuple]:
        for path in partition.files:
            stem = os.path.splitext(os.path.basename(path))[0]
            with open(path, encoding="utf-8") as fh:
                content = fh.read()
            if self._mode == "turns":
                for idx, line in enumerate(content.split("\n")):
                    if line.strip():
                        yield (stem, idx, line)
            else:
                for line in content.split("\n"):
                    m = _CON_RE.match(line)
                    if m is None:
                        continue  # reference behavior: skip unparseable
                    text, l1, s, l2, e, ctype = m.groups()
                    if l1 != l2:
                        continue  # 2010 grammar: concepts never cross lines
                    yield (stem, int(l1) - 1, int(s), int(e), text, ctype)


@dataclass
class _ConFilesWritten(WriterCommitMessage):
    files: Tuple[str, ...]


class _ConWriter(DataSourceWriter):
    """One .con file per conv_id, reference emit order (turn_idx, tok_start).

    Caller contract: each conv_id wholly inside one task (repartition
    upstream). overwrite=True clears existing .con files driver-side before
    tasks launch (writer() is constructed on the driver)."""

    def __init__(self, path: str, overwrite: bool) -> None:
        self._path = path
        os.makedirs(path, exist_ok=True)
        if overwrite:
            for old in _glob.glob(os.path.join(path, "*.con")):
                os.remove(old)

    def write(self, iterator: Iterator[Row]) -> WriterCommitMessage:
        by_conv: dict[str, list] = {}
        for row in iterator:
            by_conv.setdefault(row.conv_id, []).append(
                (
                    row.turn_idx,
                    row.tok_start,
                    row.tok_end,
                    row.mention_text,
                    row.concept_type,
                )
            )
        written = []
        for conv_id, recs in by_conv.items():
            recs.sort(key=lambda r: (r[0], r[1], r[2]))
            out = os.path.join(self._path, f"{conv_id}.con")
            with open(out, "w", encoding="utf-8") as fh:
                for turn_idx, s, e, text, ctype in recs:
                    fh.write(
                        f'c="{text.lower()}" {turn_idx + 1}:{s} '
                        f'{turn_idx + 1}:{e}||t="{ctype}"\n'
                    )
            written.append(out)
        return _ConFilesWritten(tuple(written))

    def commit(self, messages) -> None:  # noqa: ANN001 - base signature
        done = os.path.join(self._path, "_SUCCESS")
        with open(done, "w", encoding="utf-8") as fh:
            fh.write(f"{sum(len(m.files) for m in messages if m)}\n")

    def abort(self, messages) -> None:  # noqa: ANN001 - base signature
        for m in messages:
            if m is None:
                continue
            for path in m.files:
                try:
                    os.remove(path)
                except OSError:
                    pass


class I2b2DataSource(DataSource):
    """spark.read/write.format("i2b2") — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "i2b2"

    def schema(self) -> str:
        mode = self.options.get("mode", "turns")
        return TURNS_SCHEMA if mode == "turns" else MENTIONS_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        mode = self.options.get("mode", "turns")
        if mode not in ("turns", "mentions"):
            raise ValueError(f"i2b2 mode must be turns|mentions, got {mode!r}")
        return _I2b2Reader(
            self.options["path"], mode, int(self.options.get("numpartitions", 16))
        )

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        need = {
            "conv_id",
            "turn_idx",
            "tok_start",
            "tok_end",
            "mention_text",
            "concept_type",
        }
        have = set(schema.fieldNames())
        if not need <= have:
            raise ValueError(f"i2b2 writer needs columns {sorted(need - have)}")
        return _ConWriter(self.options["path"], overwrite)


# ---------------------------------------------------------------------------
# Deterministic replayable transcript micro-batch stream
# ---------------------------------------------------------------------------

_VOCAB = (
    "the patient reports persistent fever and chest pain since tuesday "
    "assistant suggests follow up blood test results show elevated markers "
    "treatment plan includes aspirin dosage review tool call returned ok "
    "please summarize prior turns for context headache nausea resolved"
).split()

_EPOCH0 = 1_700_000_000  # fixed base timestamp: rows are index-deterministic


def _row_at(i: int, convs: int) -> Tuple:
    """Pure function index -> transcript row (the replayability contract)."""
    conv = i % convs
    turn = i // convs
    role = "user" if turn % 2 == 0 else "assistant"
    h = hashlib.md5(f"turn:{i}".encode()).digest()
    n_words = 5 + h[0] % 8
    words = [_VOCAB[(h[1 + j % 14] + j * 31 + i) % len(_VOCAB)] for j in range(n_words)]
    tool = "search" if role == "assistant" and h[2] % 7 == 0 else None
    ts = datetime.fromtimestamp(_EPOCH0 + i, tz=timezone.utc).replace(tzinfo=None)
    return (f"conv-{conv:05d}", turn, role, " ".join(words), tool, ts)


class _TranscriptStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, rows_per_batch: int, convs: int) -> None:
        self._rpb = rows_per_batch
        self._convs = convs

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        i0 = int(start["index"])
        end = {"index": i0 + self._rpb}
        return self.readBetweenOffsets(start, end), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        # A concrete list, not a generator: Spark's prefetch cache
        # copy.copy()s the returned iterator (datasource_internal.getCache),
        # which generators don't support. Batches are rowsPerBatch-bounded.
        return [
            _row_at(i, self._convs)
            for i in range(int(start["index"]), int(end["index"]))
        ]


class TranscriptStreamDataSource(DataSource):
    """spark.readStream.format("transcript_stream") — deterministic
    micro-batches of north-rule-shaped transcript turns. Options:
    rowsPerBatch (default 512), convs (default 50)."""

    @classmethod
    def name(cls) -> str:
        return "transcript_stream"

    def schema(self) -> str:
        return STREAM_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _TranscriptStreamReader(
            int(self.options.get("rowsperbatch", 512)),
            int(self.options.get("convs", 50)),
        )


def register_sources(spark) -> None:  # noqa: ANN001 - SparkSession
    """Idempotent registration of both formats on a session."""
    spark.dataSource.register(I2b2DataSource)
    spark.dataSource.register(TranscriptStreamDataSource)


def write_con_dir(mentions, path: str, overwrite: bool = True) -> None:  # noqa: ANN001
    """S4 sink via the Python DataSource: one .con per conversation.

    The repartition is the writer's correctness contract (one conv_id ->
    one task -> one file); conv files are small, so the single shuffle is
    on mention-grain rows only."""
    register_sources(mentions.sparkSession)
    (
        mentions.repartition("conv_id")
        .write.format("i2b2")
        .mode("overwrite" if overwrite else "append")
        .save(path)
    )
