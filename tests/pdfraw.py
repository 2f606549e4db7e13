"""Hand-authored raw-PDF assembly for foreign-producer fixtures.

The package's own writer (``pdfgen.build_pdf``) and reader are
co-designed, so round-trips through it cannot prove robustness against
other producers (pdfTeX/dvips — the reference's actual arXiv corpus,
``intervention_graph_creation/.../directory.txt``).  The helpers here do NOT
share any code with pdfgen: each test supplies literal object bodies as
bytes, and the only mechanical part is offset arithmetic for the
cross-reference table — the one thing that cannot be hand-written
before the bytes exist.

``build_classic`` produces a classic-xref file; ``xref_section`` is
exposed separately so tests can append incremental-update sections
(freed objects, redefinitions, hybrid /XRefStm trailers) with full
byte-level control.
"""

from __future__ import annotations

import zlib


def wrap_obj(num: int, body: bytes, eol: bytes = b"\n") -> bytes:
    return b"%d 0 obj" % num + eol + body + eol + b"endobj" + eol


def xref_section(entries: dict[int, int | None], trailer_body: bytes,
                 xref_pos: int, eol: bytes = b"\n",
                 entry_eol: bytes = b" \n") -> bytes:
    """Classic xref section + trailer + startxref.  ``entries`` maps
    object number → byte offset, or None for a FREE entry; object 0
    (head of the free list) is added automatically.  ``entry_eol`` is
    the 2-byte entry terminator (`` \\n``, `` \\r`` or ``\\r\\n`` per
    PDF 32000 §7.5.4 — each row is exactly 20 bytes)."""
    assert len(entry_eol) == 2
    nums = sorted(set(entries) | {0})
    # group into contiguous subsections
    groups: list[list[int]] = [[nums[0]]]
    for n in nums[1:]:
        if n == groups[-1][-1] + 1:
            groups[-1].append(n)
        else:
            groups.append([n])
    out = bytearray(b"xref" + eol)
    for g in groups:
        out += b"%d %d" % (g[0], len(g)) + eol
        for n in g:
            if n == 0:
                out += b"0000000000 65535 f" + entry_eol
            elif entries[n] is None:
                out += b"0000000000 00000 f" + entry_eol
            else:
                out += b"%010d 00000 n" % entries[n] + entry_eol
    out += b"trailer" + eol + trailer_body + eol
    out += b"startxref" + eol + b"%d" % xref_pos + eol + b"%%EOF" + eol
    return bytes(out)


def build_classic(objects: dict[int, bytes], trailer_body: bytes,
                  eol: bytes = b"\n", entry_eol: bytes = b" \n",
                  header: bytes = b"%PDF-1.5") -> bytes:
    """Assemble header + wrapped objects (ascending number order) +
    classic xref.  Returns the full file bytes; offsets are computed,
    everything else is the caller's literal bytes."""
    out = bytearray(header + eol)
    offsets: dict[int, int | None] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += wrap_obj(num, objects[num], eol)
    xref_pos = len(out)
    out += xref_section(offsets, trailer_body, xref_pos, eol, entry_eol)
    return bytes(out)


def append_update(base: bytes, objects: dict[int, bytes],
                  freed: tuple[int, ...], trailer_body: bytes,
                  eol: bytes = b"\n") -> bytes:
    """Append an incremental-update section: new/changed objects, an
    xref covering them plus FREE rows for ``freed``, and a trailer
    (caller includes ``/Prev <old startxref>`` in ``trailer_body``)."""
    out = bytearray(base)
    offsets: dict[int, int | None] = {n: None for n in freed}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += wrap_obj(num, objects[num], eol)
    xref_pos = len(out)
    out += xref_section(offsets, trailer_body, xref_pos, eol)
    return bytes(out)


def flate(data: bytes) -> bytes:
    return zlib.compress(data)


def simple_doc_objects(content_stream: bytes,
                       font_body: bytes | None = None,
                       extra: dict[int, bytes] | None = None,
                       content_dict_extra: bytes = b"",
                       eol: bytes = b"\n") -> dict[int, bytes]:
    """The minimal 1-page scaffold every fixture shares: 1=Catalog,
    2=Pages, 3=Page (with /Font /F1 -> obj 5 when ``font_body``),
    4=content stream.  ``extra`` merges additional literal objects."""
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        4: (b"<< /Length %d%s >>" % (len(content_stream),
                                     content_dict_extra)
            + eol + b"stream" + eol
            + content_stream + eol + b"endstream"),
    }
    page = (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R")
    if font_body is not None:
        objs[5] = font_body
        page += b" /Resources << /Font << /F1 5 0 R >> >>"
    objs[3] = page + b" >>"
    if extra:
        objs.update(extra)
    return objs
