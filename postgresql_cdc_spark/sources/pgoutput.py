"""pgoutput logical-replication protocol: decoder (and test encoder).

Pure Python, zero Spark imports — unit-testable against crafted byte buffers
and embedded directly in the streaming data source's ``read()``.

Protocol semantics mirror the reference decoder (independently implemented
from the public PostgreSQL protocol docs):

- message dispatch on the first byte (`PgWalMessageDecoder.java:42-63`;
  char table `wal/MessageType.java:17-28`); TYPE/ORIGIN/TRUNCATE/
  LOGICAL_DECODING_MESSAGE are recognized but yield ``None``
  (`PgWalMessageDecoder.java:60-61`);
- RELATION registers/updates the relation registry — mid-stream schema
  evolution supported (`PgWalMessageDecoder.java:65-99`). Unlike the
  reference (which re-queries JDBC metadata out-of-band,
  `PgWalMessageDecoder.java:80-93`), we parse the column metadata embedded in
  the RELATION message itself — same resulting registry, one less round trip;
- INSERT decodes the new image (`PgWalMessageDecoder.java:101-121`); UPDATE
  skips the optional old/key tuple and keeps the NEW image only
  (`:148-180`, skip at 162-167); DELETE decodes the key/old tuple (`:123-145`);
- tuple data: per column ``t`` (int32 length + UTF-8 text), ``n`` (NULL,
  present with value None), ``u`` (TOAST-unchanged → column ABSENT from the
  record, `PgWalMessageDecoder.java:206-207`);
- DML for an unregistered relation_id is a hard error — pgoutput guarantees
  RELATION precedes first DML (`PgWalMessageDecoder.java:109-111`).

The encoder half exists for tests and changelog synthesis; PostgreSQL is the
real producer in production.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple


@dataclass(frozen=True)
class ColumnMeta:
    name: str
    type_oid: int
    flags: int = 0  # bit 0: part of replica identity key


@dataclass(frozen=True)
class Relation:
    relation_id: int
    schema: str
    name: str
    replica_identity: str  # 'd' default | 'n' nothing | 'f' full | 'i' index
    columns: Tuple[ColumnMeta, ...]


@dataclass(frozen=True)
class TxBegin:
    final_lsn: int
    commit_ts: int
    xid: int


@dataclass(frozen=True)
class TxCommit:
    commit_lsn: int
    end_lsn: int
    commit_ts: int


@dataclass(frozen=True)
class ChangeRecord:
    op: str  # 'I' | 'U' | 'D'
    relation: Relation
    # column name -> text value; None = SQL NULL; ABSENT key = TOAST-unchanged
    columns: Dict[str, Optional[str]]


class ProtocolError(ValueError):
    pass


class PgOutputDecoder:
    """Stateful decoder: one instance per replication stream (the relation
    registry is the only state, keyed by relation_id)."""

    def __init__(self) -> None:
        self.relations: Dict[int, Relation] = {}

    # -- primitives ----------------------------------------------------------

    @staticmethod
    def _cstring(buf: bytes, pos: int) -> Tuple[str, int]:
        end = buf.index(b"\x00", pos)
        return buf[pos:end].decode("utf-8"), end + 1

    # -- tuple data ----------------------------------------------------------

    def _read_tuple(
        self, buf: bytes, pos: int, cols: Tuple[ColumnMeta, ...]
    ) -> Tuple[Dict[str, Optional[str]], int]:
        (ncols,) = struct.unpack_from(">H", buf, pos)
        pos += 2
        if ncols != len(cols):
            raise ProtocolError(
                f"tuple has {ncols} columns, relation declares {len(cols)}"
            )
        out: Dict[str, Optional[str]] = {}
        for meta in cols:
            kind = buf[pos:pos + 1]
            pos += 1
            if kind == b"t":
                (ln,) = struct.unpack_from(">i", buf, pos)
                pos += 4
                # Python slicing forgives out-of-range where the JVM's
                # ByteBuffer throws: without this check a truncated or
                # length-corrupted value SILENTLY decodes short (or, for a
                # negative length, rewinds pos and re-reads earlier bytes as
                # later columns) instead of hitting the error channel.
                if ln < 0 or pos + ln > len(buf):
                    raise ProtocolError(
                        f"value length {ln} at offset {pos} exceeds "
                        f"message size {len(buf)}"
                    )
                out[meta.name] = buf[pos:pos + ln].decode("utf-8")
                pos += ln
            elif kind == b"n":
                out[meta.name] = None  # present-but-NULL
            elif kind == b"u":
                pass  # TOAST-unchanged: absent, not null
            else:
                raise ProtocolError(f"unknown tuple sub-type {kind!r}")
        return out, pos

    @staticmethod
    def _skip_tuple(buf: bytes, pos: int) -> int:
        """Fast-forward over a tuple without materializing values
        (`PgWalMessageDecoder.java:217-228`)."""
        (ncols,) = struct.unpack_from(">H", buf, pos)
        pos += 2
        for _ in range(ncols):
            kind = buf[pos:pos + 1]
            pos += 1
            if kind == b"t":
                (ln,) = struct.unpack_from(">i", buf, pos)
                pos += 4
                if ln < 0 or pos + ln > len(buf):
                    raise ProtocolError(
                        f"value length {ln} at offset {pos} exceeds "
                        f"message size {len(buf)}"
                    )
                pos += ln
            elif kind in (b"n", b"u"):
                continue
            else:
                raise ProtocolError(f"unknown tuple sub-type {kind!r}")
        return pos

    # -- per-message decoders -------------------------------------------------

    def _relation(self, buf: bytes) -> None:
        pos = 1
        (relation_id,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        schema, pos = self._cstring(buf, pos)
        name, pos = self._cstring(buf, pos)
        replident = chr(buf[pos])
        pos += 1
        (ncols,) = struct.unpack_from(">H", buf, pos)
        pos += 2
        cols: List[ColumnMeta] = []
        for _ in range(ncols):
            flags = buf[pos]
            pos += 1
            cname, pos = self._cstring(buf, pos)
            type_oid, _type_mod = struct.unpack_from(">ii", buf, pos)
            pos += 8
            cols.append(ColumnMeta(cname, type_oid, flags))
        self.relations[relation_id] = Relation(
            relation_id, schema, name, replident, tuple(cols)
        )

    def _require_relation(self, relation_id: int) -> Relation:
        rel = self.relations.get(relation_id)
        if rel is None:
            raise ProtocolError(f"DML for unknown relation {relation_id}")
        return rel

    def decode(self, buf: bytes):
        """One WAL message → Relation | TxBegin | TxCommit | ChangeRecord |
        None (recognized-but-ignored kinds).

        ONE exception type for malformed input: any low-level failure on a
        truncated or bit-flipped buffer (struct underrun, missing C-string
        terminator, invalid UTF-8) surfaces as ``ProtocolError`` — a relay
        loop catches exactly one error class for its drop-and-reconnect
        path instead of whichever internal error the corruption happened to
        hit (the reference leans on the JVM equivalent: any decoder throw
        reaches the engine's single catch at ``CdcEngine.java:143``)."""
        try:
            return self._decode(buf)
        except ProtocolError:
            raise
        except (struct.error, IndexError, UnicodeDecodeError, ValueError) as e:
            raise ProtocolError(f"malformed message: {e}") from e

    def _decode(self, buf: bytes):
        if not buf:
            raise ProtocolError("empty message")
        tag = buf[0:1]
        if tag == b"R":
            self._relation(buf)
            return None  # registry side effect only, like the reference
        if tag == b"B":
            final_lsn, commit_ts, xid = struct.unpack_from(">qqi", buf, 1)
            return TxBegin(final_lsn, commit_ts, xid)
        if tag == b"C":
            _flags = buf[1]
            commit_lsn, end_lsn, commit_ts = struct.unpack_from(">qqq", buf, 2)
            return TxCommit(commit_lsn, end_lsn, commit_ts)
        if tag == b"I":
            (relation_id,) = struct.unpack_from(">i", buf, 1)
            rel = self._require_relation(relation_id)
            if buf[5:6] != b"N":
                raise ProtocolError("INSERT without new tuple")
            columns, _ = self._read_tuple(buf, 6, rel.columns)
            return ChangeRecord("I", rel, columns)
        if tag == b"U":
            (relation_id,) = struct.unpack_from(">i", buf, 1)
            rel = self._require_relation(relation_id)
            pos = 5
            sub = buf[pos:pos + 1]
            if sub in (b"K", b"O"):  # optional old/key tuple: skip, keep new
                pos = self._skip_tuple(buf, pos + 1)
                sub = buf[pos:pos + 1]
            if sub != b"N":
                raise ProtocolError("UPDATE without new tuple")
            columns, _ = self._read_tuple(buf, pos + 1, rel.columns)
            return ChangeRecord("U", rel, columns)
        if tag == b"D":
            (relation_id,) = struct.unpack_from(">i", buf, 1)
            rel = self._require_relation(relation_id)
            sub = buf[5:6]
            if sub not in (b"K", b"O"):
                raise ProtocolError("DELETE without key/old tuple")
            columns, _ = self._read_tuple(buf, 6, rel.columns)
            return ChangeRecord("D", rel, columns)
        if tag in (b"Y", b"O", b"T", b"M"):
            return None  # recognized, deliberately ignored
        raise ProtocolError(f"unknown message tag {tag!r}")


# --- encoder (tests / replay synthesis) --------------------------------------


def _cstr(s: str) -> bytes:
    return s.encode("utf-8") + b"\x00"


def encode_relation(rel: Relation) -> bytes:
    out = [b"R", struct.pack(">i", rel.relation_id), _cstr(rel.schema),
           _cstr(rel.name), rel.replica_identity.encode(),
           struct.pack(">H", len(rel.columns))]
    for c in rel.columns:
        out += [bytes([c.flags]), _cstr(c.name), struct.pack(">ii", c.type_oid, -1)]
    return b"".join(out)


def encode_tuple(values: List[Optional[str]], toast: Optional[set] = None) -> bytes:
    """``values[i] is None`` → NULL; index in ``toast`` → 'u' unchanged."""
    out = [struct.pack(">H", len(values))]
    for i, v in enumerate(values):
        if toast and i in toast:
            out.append(b"u")
        elif v is None:
            out.append(b"n")
        else:
            enc = v.encode("utf-8")
            out += [b"t", struct.pack(">i", len(enc)), enc]
    return b"".join(out)


def encode_begin(final_lsn: int, commit_ts: int, xid: int) -> bytes:
    return b"B" + struct.pack(">qqi", final_lsn, commit_ts, xid)


def encode_commit(commit_lsn: int, end_lsn: int, commit_ts: int) -> bytes:
    return b"C\x00" + struct.pack(">qqq", commit_lsn, end_lsn, commit_ts)


def encode_insert(relation_id: int, values: List[Optional[str]],
                  toast: Optional[set] = None) -> bytes:
    return b"I" + struct.pack(">i", relation_id) + b"N" + encode_tuple(values, toast)


def encode_update(relation_id: int, new_values: List[Optional[str]],
                  old_values: Optional[List[Optional[str]]] = None,
                  toast: Optional[set] = None) -> bytes:
    out = b"U" + struct.pack(">i", relation_id)
    if old_values is not None:
        out += b"O" + encode_tuple(old_values)
    return out + b"N" + encode_tuple(new_values, toast)


def encode_delete(relation_id: int, key_values: List[Optional[str]]) -> bytes:
    return b"D" + struct.pack(">i", relation_id) + b"K" + encode_tuple(key_values)


def encode_truncate(relation_ids: List[int], cascade: bool = False,
                    restart_identity: bool = False) -> bytes:
    """Real pgoutput TRUNCATE wire format (int32 nrelations, int8 option
    bits 1=CASCADE 2=RESTART IDENTITY, then the relation OIDs) — the decoder
    recognizes-and-drops the whole message (reference MessageType.java:17-28
    behavior), but gates that prove the drop keeps offsets intact should
    replay honest bytes, not an empty tag."""
    out = b"T" + struct.pack(">i", len(relation_ids))
    out += struct.pack(">b", (1 if cascade else 0) | (2 if restart_identity else 0))
    for rid in relation_ids:
        out += struct.pack(">i", rid)
    return out
