"""Pre-shard a monolithic gzipped XML dump into N independently-gzipped
shard files so the parse stage parallelizes.

Gzip is unsplittable: one 10 GB ``discogs_releases.xml.gz`` is ONE Spark
task no matter the cluster size (the reference has the same limit — its
whole loader is single-threaded anyway, main.rs:90-94). The fix is a
LAYOUT fix, paid once: stream-decompress the dump (never holding more
than one record + one chunk in memory), split on RECORD boundaries, and
write each slice as its own well-formed, individually-gzipped XML file.
Downstream, N shard files = N parse tasks, and every byte of record
content is preserved verbatim (the shards concatenate back to the same
record sequence).

Record-boundary detection is a depth-tracking byte scanner, not a plain
``</release>`` search: a nested same-tag element (``<label>`` inside
``<sublabels>`` of a ``<label>`` record — real Discogs shape) must not be
mistaken for a record end, and self-closing ``<label/>`` forms close at
depth 0 without an end tag. The scanner is quote- and comment-aware: a
raw ``>`` (or ``/>``) inside an attribute value is spec-legal and must
not terminate the tag scan, and ``<!-- -->`` comments may contain record
tags without affecting depth (attribute values cannot contain a raw
``<``, so comment starts are unambiguous). Limitation (documented,
matches the dumps): no CDATA sections — a ``<release`` byte sequence
inside CDATA would be miscounted; Discogs dumps escape text content
instead.
"""

from __future__ import annotations

import gzip
import os
import re

from ..schemas import ROW_TAGS
from .xml_source import _open_maybe_gzip, sniff_root_tag

_CHUNK = 4 << 20  # decompressed read granularity
_FLUSH = 1 << 20  # write complete-record prefixes at least this often

# From a position just past "<tag", consume attribute bytes — where '>'
# inside '...'/"..." attribute values does NOT terminate the tag — up to
# and including the first unquoted '>'. No match = the tag's terminator
# is beyond the buffered bytes.
_TAG_END_RE = re.compile(rb"(?:[^>\"']|\"[^\"]*\"|'[^']*')*>")
_COMMENT_OPEN = b"<!--"
_COMMENT_CLOSE = b"-->"


class _ShardWriter:
    """Sequence of ``part-NNNNN.xml.gz`` files, each a well-formed document:
    original prologue (xml decl + root open tag), a run of records, root
    close tag."""

    def __init__(self, out_dir: str, prologue: bytes, root_tag: str) -> None:
        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self.prologue = prologue
        self.footer = b"</" + root_tag.encode() + b">\n"
        self.paths: list[str] = []
        self._f = None
        self.cur_bytes = 0

    def write(self, data: bytes) -> None:
        if self._f is None:
            path = os.path.join(
                self.out_dir, f"part-{len(self.paths):05d}.xml.gz"
            )
            self.paths.append(path)
            self._f = gzip.open(path, "wb", compresslevel=1)
            self._f.write(self.prologue)
            self.cur_bytes = len(self.prologue)
        self._f.write(data)
        self.cur_bytes += len(data)

    def roll(self) -> None:
        if self._f is not None:
            self._f.write(self.footer)
            self._f.close()
            self._f = None
            self.cur_bytes = 0

    def close(self) -> None:
        self.roll()


def preshard_gzip_dump(
    path: str,
    out_dir: str,
    target_bytes: int = 64 << 20,
    kind: str | None = None,
) -> list[str]:
    """Split one (gzipped or plain) XML dump into record-aligned gzip
    shards of ~``target_bytes`` decompressed each; returns shard paths.

    Single streaming pass, O(record + chunk) memory. Shard k holds a
    contiguous run of complete records; record bytes are copied verbatim
    (parse output is byte-identical to reading the original, union-wise).
    """
    kind = kind or sniff_root_tag(path)
    row_tag = ROW_TAGS[kind]
    tag = row_tag.encode()
    open_re = re.compile(rb"<" + tag + rb"(?=[\s/>])")
    end_token = b"</" + tag + b">"

    with _open_maybe_gzip(path) as src:
        # prologue = everything before the first record's open tag that is
        # NOT inside a <!-- --> comment (a commented-out record sample in
        # the header must not be mistaken for the first record)
        buf = b""
        scan = 0
        first = None
        while first is None:
            m = open_re.search(buf, scan)
            c = buf.find(_COMMENT_OPEN, scan)
            if m is not None and (c < 0 or m.start() < c):
                first = m
                break
            if c >= 0 and (m is None or c < m.start()):
                e = buf.find(_COMMENT_CLOSE, c + len(_COMMENT_OPEN))
                if e >= 0:
                    scan = e + len(_COMMENT_CLOSE)
                    continue
            chunk = src.read(_CHUNK)
            if not chunk:
                raise ValueError(f"no <{row_tag}> record found in {path}")
            buf += chunk
        prologue = buf[: first.start()]
        buf = buf[first.start() :]

        writer = _ShardWriter(out_dir, prologue, kind)
        # c_next/c_from: comment-scan memo. A dump with no comments must
        # not pay a full-remaining-buffer find() per record (O(n*records));
        # c_from remembers how far a miss has already searched (re-searched
        # only for bytes appended after it), c_next caches a hit ahead of
        # pos so the find isn't repeated per record until it is consumed.
        state = {"buf": buf, "pos": 0, "rec_start": 0, "c_next": -1, "c_from": 0}
        depth = 0
        eof = False

        def next_comment(buf: bytes, pos: int) -> int:
            c = state["c_next"]
            if c >= pos:
                return c
            start = max(pos, state["c_from"])
            c = buf.find(_COMMENT_OPEN, start)
            if c < 0:
                # miss: everything before the last 3 bytes can't start a
                # comment later either (a boundary-spanning "<!--" keeps
                # its first bytes inside the overlap window)
                state["c_from"] = max(0, len(buf) - (len(_COMMENT_OPEN) - 1))
            state["c_next"] = c
            return c

        def flush(roll_check: bool) -> None:
            # write the classified complete-record prefix; roll the shard
            # when it has reached the target size
            rs = state["rec_start"]
            if not rs:
                return
            writer.write(state["buf"][:rs])
            state["buf"] = state["buf"][rs:]
            state["pos"] -= rs
            state["rec_start"] = 0
            state["c_from"] = max(0, state["c_from"] - rs)
            state["c_next"] = state["c_next"] - rs if state["c_next"] >= rs else -1
            if roll_check and writer.cur_bytes >= target_bytes:
                writer.roll()

        while True:
            buf, pos = state["buf"], state["pos"]
            m_open = open_re.search(buf, pos)
            i_close = buf.find(end_token, pos)
            i_comment = next_comment(buf, pos)
            i_open = m_open.start() if m_open else -1
            events = [
                (i, k)
                for i, k in ((i_comment, 0), (i_open, 1), (i_close, 2))
                if i >= 0
            ]
            boundary = -1
            need_more = False
            if not events:
                if eof:
                    break
                need_more = True
            else:
                i_ev, ev_kind = min(events)
                if ev_kind == 0:
                    # comment: depth-neutral even if it contains record
                    # tags; skip it whole (copied verbatim with whichever
                    # record chunk it precedes)
                    e = buf.find(_COMMENT_CLOSE, i_ev + len(_COMMENT_OPEN))
                    if e < 0 and not eof:
                        need_more = True  # comment spans the chunk edge
                    elif e < 0:
                        break  # unterminated trailing comment at EOF: drop
                    else:
                        state["pos"] = e + len(_COMMENT_CLOSE)
                elif ev_kind == 1:
                    # open tag: find its UNQUOTED '>' (a raw '>' or '/>'
                    # inside an attribute value is spec-legal content) to
                    # know where it ends and whether it is self-closing
                    m_end = _TAG_END_RE.match(buf, m_open.end())
                    if m_end is None and not eof:
                        need_more = True  # tag spans the chunk edge
                    elif m_end is None:
                        break  # truncated trailing tag at EOF: drop
                    else:
                        j = m_end.end()  # one past the closing '>'
                        if buf[j - 2 : j - 1] == b"/":  # self-closing
                            if depth == 0:
                                boundary = j
                        else:
                            depth += 1
                        state["pos"] = j
                else:
                    depth -= 1
                    state["pos"] = i_close + len(end_token)
                    if depth == 0:
                        boundary = state["pos"]
            if need_more:
                if state["rec_start"] >= _FLUSH:
                    flush(roll_check=True)
                chunk = src.read(_CHUNK)
                if not chunk:
                    eof = True
                else:
                    state["buf"] += chunk
                continue
            if boundary >= 0:
                state["rec_start"] = boundary
                if writer.cur_bytes + boundary >= target_bytes:
                    flush(roll_check=True)
        flush(roll_check=False)
        writer.close()
    return writer.paths
