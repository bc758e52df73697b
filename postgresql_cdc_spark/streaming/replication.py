"""Live logical-replication transport: slot/publication DDL, replication-mode
connection config, the poll loop, and retry-with-backoff (SURVEY.md §2.1
S1-S4, S16).

Reference parity:

- idempotent ``CREATE_REPLICATION_SLOT ... LOGICAL pgoutput`` with an
  exists-check first (`CdcEngine.java:163-187`);
- idempotent ``CREATE PUBLICATION ... FOR ALL TABLES`` (`CdcEngine.java:
  189-215`);
- replication-mode connection properties — replication=database, minimum
  server version 11, simple query protocol (`PgConnectionFactory.java:27-31`);
- on any stream error: close, sleep (default 10 s), reconnect, re-register
  slot + publication, resume — the server replays from the slot's confirmed
  LSN so no client-side position is needed (`CdcEngine.java:143-159`);
- the flush-LSN ack (``send_feedback``) is the ``setFlushedLSN`` +
  ``forceUpdateStatus`` analog (`CdcEngine.java:132-137`).

The transport is dependency-injected: ``connection_factory(replication: bool)``
returns a DB-API-ish connection; the replication connection must offer
``start_replication(...) -> stream`` where the stream yields objects with
``.data_start`` (LSN) and ``.payload`` (pgoutput bytes) and offers
``send_feedback(flush_lsn=...)``. ``psycopg2_connection_factory`` builds the
real thing when psycopg2 is installed (this container has neither psycopg nor
a PostgreSQL server, so everything here is unit-tested against fakes —
`tests/test_replication.py`).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Iterator, Optional, Tuple

PLUGIN = "pgoutput"


@dataclass
class ReplicationConfig:
    """Connection + stream settings (the reference's ctor surface,
    `CdcEngine.java:31-65` + `PgConnectionFactory.java:22-42`)."""

    dsn: str = ""
    slot: str = "spark_cdc_slot"
    publication: str = "spark_cdc_pub"
    proto_version: int = 1
    status_interval_s: int = 10
    retry_backoff_s: float = 10.0
    max_retries: Optional[int] = None  # None = retry forever (reference loop)
    # replication-mode connection options (PgConnectionFactory.java:27-31)
    options: dict = field(default_factory=lambda: {
        "replication": "database",
        "assume_min_server_version": "11.0",
        "prefer_query_mode": "simple",
    })


def psycopg2_connection_factory(config: ReplicationConfig) -> Callable:
    """Real connection factory (needs psycopg2; import-gated)."""
    try:
        import psycopg2
        import psycopg2.extras
    except ImportError as e:  # pragma: no cover - not installed here
        raise NotImplementedError(
            "live replication needs psycopg2; this environment has no "
            "PostgreSQL driver — use the WAL-archive transport or inject a "
            "custom connection_factory"
        ) from e

    def factory(replication: bool):  # pragma: no cover - needs a server
        if replication:
            return psycopg2.connect(
                config.dsn,
                connection_factory=psycopg2.extras.LogicalReplicationConnection,
            )
        return psycopg2.connect(config.dsn)

    return factory


import re as _re

_NAME_RE = _re.compile(r"^[a-z0-9_]+$")


def _check_name(kind: str, name: str) -> str:
    """Slot/publication names are interpolated into replication DDL (the
    replication protocol's CREATE_REPLICATION_SLOT cannot be parameterized);
    restrict them to lowercase identifier characters so a malformed config
    value cannot break or inject into the statement."""
    if not _NAME_RE.match(name or ""):
        raise ValueError(
            f"invalid {kind} name {name!r}: must match [a-z0-9_]+"
        )
    return name


def ensure_replication_slot(conn, slot: str) -> bool:
    """Create the logical slot iff absent; True when created.

    Same exists-then-create shape as the reference (`CdcEngine.java:166-181`)
    — both statements on the one connection, no race handling beyond what the
    reference does (a concurrent create surfaces as an error and the retry
    loop re-enters with the slot now existing).
    """
    _check_name("slot", slot)
    with conn.cursor() as cur:
        cur.execute(
            "SELECT 1 FROM pg_replication_slots WHERE slot_name = %s", (slot,)
        )
        if cur.fetchone():
            return False
        cur.execute(f"CREATE_REPLICATION_SLOT {slot} LOGICAL {PLUGIN}")
        return True


def ensure_publication(conn, publication: str) -> bool:
    """Create the FOR ALL TABLES publication iff absent; True when created
    (`CdcEngine.java:192-208`)."""
    _check_name("publication", publication)
    with conn.cursor() as cur:
        cur.execute(
            "SELECT 1 FROM pg_publication WHERE pubname = %s", (publication,)
        )
        if cur.fetchone():
            return False
        cur.execute(f'CREATE PUBLICATION "{publication}" FOR ALL TABLES')
        return True


class LiveReplicationTransport:
    """Frame iterator over a live logical-replication stream with the
    reference's reconnect loop. Yields ``(lsn, payload)`` tuples — the same
    shape ``read_wal_frames`` produces, so the decoder and the Spark stream
    reader are transport-agnostic.
    """

    def __init__(
        self,
        connection_factory: Callable,
        config: ReplicationConfig | None = None,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        self._factory = connection_factory
        self.config = config or ReplicationConfig()
        self._sleep = sleep
        self._stream = None
        self._conn = None
        self._flush_lsn: Optional[int] = None

    # -- setup ---------------------------------------------------------------

    def _connect(self):
        """Open the replication connection, run the idempotent DDL, start the
        stream (`CdcEngine.java:67-84`). The slot remembers its confirmed LSN
        server-side, so restart resumes without client positioning."""
        cfg = self.config
        self._conn = self._factory(True)
        ensure_replication_slot(self._conn, cfg.slot)
        ensure_publication(self._conn, cfg.publication)
        self._stream = self._conn.start_replication(
            slot_name=cfg.slot,
            decode=False,
            options={
                "proto_version": str(cfg.proto_version),
                "publication_names": cfg.publication,
            },
            status_interval=cfg.status_interval_s,
        )

    def _close(self) -> None:
        for obj in (self._stream, self._conn):
            try:
                if obj is not None:
                    obj.close()
            except Exception:  # noqa: BLE001 - already tearing down
                pass
        self._stream = None
        self._conn = None

    # -- the loop ------------------------------------------------------------

    def frames(self) -> Iterator[Tuple[int, bytes]]:
        """Poll the stream; on error close + backoff + reconnect + resume
        (`CdcEngine.java:89-159`). Ends when the stream reports exhaustion by
        returning None from read_message twice in a row with ``finite=True``
        streams (test transport), or runs forever against a live server."""
        cfg = self.config
        attempts = 0
        while True:
            try:
                if self._stream is None:
                    self._connect()
                while True:
                    msg = self._stream.read_message()
                    if msg is None:
                        if getattr(self._stream, "exhausted", False):
                            return
                        # idle poll backoff (CdcEngine.java:98-100)
                        self._sleep(0.01)
                        continue
                    attempts = 0  # progress made — retry budget refreshes
                    yield msg.data_start, msg.payload
            except GeneratorExit:
                self._close()
                raise
            except Exception:  # noqa: BLE001 - reference catches everything
                self._close()
                attempts += 1
                if cfg.max_retries is not None and attempts > cfg.max_retries:
                    raise
                self._sleep(cfg.retry_backoff_s)

    # -- ack -----------------------------------------------------------------

    def ack(self, flush_lsn: int) -> None:
        """Confirm the flush LSN — the server may discard WAL ≤ LSN
        (`CdcEngine.java:132-137`). No-op when disconnected; the slot's
        confirmed LSN then simply stays at the last acked value (at-least-once
        is preserved)."""
        self._flush_lsn = flush_lsn
        if self._stream is not None:
            self._stream.send_feedback(flush_lsn=flush_lsn)
