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
depth 0 without an end tag. Limitation (documented, matches the dumps):
no CDATA sections — a ``<release`` byte sequence inside CDATA would be
miscounted; Discogs dumps escape text content instead.
"""

from __future__ import annotations

import gzip
import os
import re

from ..schemas import ROW_TAGS
from .xml_source import _open_maybe_gzip, sniff_root_tag

_CHUNK = 4 << 20  # decompressed read granularity
_FLUSH = 1 << 20  # write complete-record prefixes at least this often


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
        # prologue = everything before the first record's open tag
        buf = b""
        first = None
        while first is None:
            chunk = src.read(_CHUNK)
            if not chunk:
                raise ValueError(f"no <{row_tag}> record found in {path}")
            buf += chunk
            first = open_re.search(buf)
        prologue = buf[: first.start()]
        buf = buf[first.start() :]

        writer = _ShardWriter(out_dir, prologue, kind)
        state = {"buf": buf, "pos": 0, "rec_start": 0}
        depth = 0
        eof = False

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
            if roll_check and writer.cur_bytes >= target_bytes:
                writer.roll()

        while True:
            buf, pos = state["buf"], state["pos"]
            m_open = open_re.search(buf, pos)
            i_close = buf.find(end_token, pos)
            i_open = m_open.start() if m_open else -1
            boundary = -1
            need_more = False
            if i_open >= 0 and (i_close < 0 or i_open < i_close):
                # open tag: need its '>' to know if it is self-closing
                j = buf.find(b">", i_open)
                if j < 0 and not eof:
                    need_more = True  # tag spans the chunk edge
                elif j < 0:
                    break  # truncated trailing tag at EOF: drop
                else:
                    if buf[j - 1 : j] == b"/":  # self-closing
                        if depth == 0:
                            boundary = j + 1
                    else:
                        depth += 1
                    state["pos"] = j + 1
            elif i_close >= 0:
                depth -= 1
                state["pos"] = i_close + len(end_token)
                if depth == 0:
                    boundary = state["pos"]
            else:
                if eof:
                    break
                need_more = True
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
