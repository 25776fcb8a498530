"""Error types for jodie_spark.

Mirrors the reference's error surface (JodieValidationError:
reference JodieValidator.scala:5-6) plus protocol-level errors for the
native Delta-log implementation.
"""

from __future__ import annotations


class JodieValidationError(Exception):
    """Validation failure (missing columns, bad arguments).

    Parity: reference JodieValidator.scala:5-6 (case class wrapping a
    message + cause).
    """


class DeltaProtocolError(RuntimeError):
    """The on-disk transaction log violates the Delta protocol."""


class MergeMultipleMatchesError(RuntimeError):
    """A target row matched more than one source row under an
    update/delete clause — nondeterministic merge result.

    Parity: org.apache.spark.sql.delta.DeltaUnsupportedOperationException
    MERGE_MATCHED_ROW_MULTIPLE_SOURCE (delta-spark raises; the reference's
    Type2Scd.scala:63-80 SCD semantics rely on at-most-one match).
    Pass ``allow_multiple_matches=True`` to ``execute()`` to opt into
    one-output-row-per-match behavior.
    """


class ConcurrentModificationException(RuntimeError):
    """Another writer committed the same version first (optimistic
    concurrency conflict on the `<version>.json` atomic create)."""


class ConcurrentAppendException(ConcurrentModificationException):
    """A concurrent commit added files this transaction's scan would
    have read, so the result it computed is stale.

    Parity: org.apache.spark.sql.delta.ConcurrentAppendException —
    delta-core's ConflictChecker raises it when a winning commit's
    AddFiles match the losing transaction's recorded read predicates.
    Under the default WriteSerializable isolation, winning commits that
    are *blind appends* (commitInfo.isBlindAppend=true: adds only, no
    table read) are exempt; under ``delta.isolationLevel=Serializable``
    they conflict too. The reference inherits the same semantics from
    delta-core (build.sbt:9) for its MERGE/DELETE-based helpers.
    """


class ConcurrentDeleteReadException(ConcurrentModificationException):
    """A concurrent commit removed (rewrote or deleted) files this
    transaction's scan read, so the result it computed is stale.

    Parity: org.apache.spark.sql.delta.ConcurrentDeleteReadException —
    delta-core's ConflictChecker (checkForDeletedFilesAgainstCurrent
    TxnReadFiles). Unlike the added-files check there is no
    blind-append exemption: a commit carrying removes is never blind,
    and reading since-deleted data is stale at every isolation level.
    dataChange=false removes (compaction inputs) are exempt — the same
    rows live on in the compacted output.
    """


class VersionNotFoundError(ValueError):
    """Requested version cannot be time-travelled to.

    Parity: org.apache.spark.sql.delta.VersionNotFoundException —
    carries the earliest/latest reachable versions
    (reference ChangeDataFeedHelper.scala:207-210 catches it).
    """

    def __init__(self, requested: int, earliest: int, latest: int):
        super().__init__(
            f"Cannot time travel Delta table to version {requested}. "
            f"Available versions: [{earliest}, {latest}]."
        )
        self.requested = requested
        self.earliest = earliest
        self.latest = latest
