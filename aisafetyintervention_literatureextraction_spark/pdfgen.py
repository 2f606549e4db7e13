"""Deterministic PDF fixture writer (stdlib-only) for the PDF-ingest
path (operators/pdf.py).

The reference corpus is a directory of PDFs (reference extract.py:65
``glob("*.pdf")``); no PDF library ships in this container, so tests
and the ``s1_pdf_docs`` oracle need a writer that emits real spec-shaped
files covering the features the reader claims: classic xref tables,
PDF 1.5 cross-reference *streams* with PNG predictors, ``/Type
/ObjStm`` object streams, FlateDecode, literal/hex strings with the
full escape set, ``Tj``/``TJ``-with-kerning/``'`` show operators, and
multi-page page trees.  ``ensure_pdf_fixture`` writes each PDF next to
an ``expected/*.txt`` sidecar holding the exact text the reader must
reconstruct — the DuckDB oracle reads the sidecars, the Spark query
reads the PDFs, and the hash compare closes the loop.

Every byte is a pure function of the doc index — no timestamps, no
randomness — so Spark and DuckDB see identical fixtures at every SF.
"""

from __future__ import annotations

import pathlib
import zlib


def _encode(text: str) -> bytes:
    """PDF string bytes: Latin-1 when it fits, else UTF-16BE with BOM
    (the reader dispatches on the BOM)."""
    try:
        return text.encode("latin-1")
    except UnicodeEncodeError:
        return b"\xfe\xff" + text.encode("utf-16-be")


def _esc_lit(text: str) -> bytes:
    """Escape a literal PDF string: backslash, parens, and control
    chars as octal (exercises the reader's ``\\ddd`` path)."""
    out = bytearray()
    for b in _encode(text):
        if b in (0x5C, 0x28, 0x29):
            out += b"\\" + bytes([b])
        elif b < 32:
            out += b"\\%03o" % b
        else:
            out.append(b)
    return bytes(out)


def _cmap_codes(pages: list[list[str]], two_byte: bool) -> dict[str, int]:
    """Deterministic char → private glyph code assignment (the
    subset-font situation: string bytes are meaningless without the
    font's /ToUnicode CMap). 2-byte mode routes printable ASCII
    through one contiguous range (exercises bfrange-increment) and
    everything else through bfchar entries."""
    chars: list[str] = []
    seen: set[str] = set()
    for pg in pages:
        for ln in pg:
            for ch in ln:
                if ch not in seen:
                    seen.add(ch)
                    chars.append(ch)
    codes: dict[str, int] = {}
    if two_byte:
        extra = 0x0200
        for ch in chars:
            o = ord(ch)
            if 0x20 <= o <= 0x7E:
                codes[ch] = 0x0100 + (o - 0x20)
            else:
                codes[ch] = extra
                extra += 1
    else:
        for i, ch in enumerate(chars):
            codes[ch] = i + 1
    return codes


def _cmap_stream(codes: dict[str, int], two_byte: bool) -> bytes:
    """Serialize a /ToUnicode CMap (PDF 32000 §9.10.3): codespace
    range, the ASCII bfrange (2-byte mode), and ≤100-entry bfchar
    blocks; destinations are UTF-16BE."""
    fmt = "%04x" if two_byte else "%02x"
    lines = [
        b"/CIDInit /ProcSet findresource begin",
        b"12 dict begin",
        b"begincmap",
        b"/CMapName /Custom-UCS def",
        b"1 begincodespacerange",
        b"<0000> <ffff>" if two_byte else b"<00> <ff>",
        b"endcodespacerange",
    ]
    if two_byte:
        lines += [b"1 beginbfrange", b"<0100> <015e> <0020>", b"endbfrange"]
        items = sorted(
            ((ch, c) for ch, c in codes.items() if c >= 0x0200),
            key=lambda kv: kv[1],
        )
    else:
        items = sorted(codes.items(), key=lambda kv: kv[1])
    for i in range(0, len(items), 100):
        chunk = items[i:i + 100]
        lines.append(b"%d beginbfchar" % len(chunk))
        for ch, c in chunk:
            lines.append(
                b"<" + (fmt % c).encode() + b"> <"
                + ch.encode("utf-16-be").hex().encode() + b">"
            )
        lines.append(b"endbfchar")
    lines += [b"endcmap", b"CMap currentdict /CMap defineresource pop",
              b"end", b"end"]
    return b"\n".join(lines)


def _line_ops_cmap(lines: list[str], codes: dict[str, int],
                   two_byte: bool) -> bytes:
    fmt = "%04x" if two_byte else "%02x"
    ops = [b"BT", b"/F1 12 Tf", b"14 TL", b"72 720 Td"]
    for k, ln in enumerate(lines):
        if k > 0:
            ops.append(b"0 -14 Td")
        hx = "".join(fmt % codes[ch] for ch in ln)
        ops.append(b"<" + hx.encode() + b"> Tj")
    ops.append(b"ET")
    return b"\n".join(ops)


def _line_ops(lines: list[str], mode: str) -> bytes:
    """One page's text operators for the given show-operator mode."""
    ops = [b"BT", b"/F1 12 Tf", b"14 TL", b"72 720 Td"]
    if mode == "quote":
        ops.append(b"(" + _esc_lit(lines[0]) + b") Tj")
        for ln in lines[1:]:
            ops.append(b"(" + _esc_lit(ln) + b") '")
    else:
        for k, ln in enumerate(lines):
            if k > 0:
                ops.append(b"0 -14 Td")
            if mode == "hex":
                ops.append(b"<" + _encode(ln).hex().encode() + b"> Tj")
            elif mode == "tjarr":
                # words separated by a -250 kern (reads as a space);
                # the first word split mid-word by a -60 kern (no space)
                words = ln.split(" ")
                frags: list[bytes] = []
                w0 = words[0]
                if len(w0) > 2:
                    frags += [b"(" + _esc_lit(w0[:2]) + b")", b"-60",
                              b"(" + _esc_lit(w0[2:]) + b")"]
                else:
                    frags.append(b"(" + _esc_lit(w0) + b")")
                for w in words[1:]:
                    frags += [b"-250", b"(" + _esc_lit(w) + b")"]
                ops.append(b"[" + b" ".join(frags) + b"] TJ")
            else:
                ops.append(b"(" + _esc_lit(ln) + b") Tj")
    ops.append(b"ET")
    return b"\n".join(ops)


# -- writer-side standard security handler (V2 R3 RC4, empty pwds) ----

_ENC_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E,
    0x56, 0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68,
    0x3E, 0x80, 0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])
_ENC_ID0 = bytes(range(0x10, 0x20))  # deterministic file ID
_ENC_P = -44


def _wrc4(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray()
    i = j = 0
    for b in data:
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out.append(b ^ S[(S[i] + S[j]) & 0xFF])
    return bytes(out)


def _enc_setup(length: int = 128):
    """Algorithms 3/2/5 (PDF 32000 §7.6.3) for EMPTY owner and user
    passwords: returns (file_key, /Encrypt dict bytes).  Deterministic
    — fixture bytes stay a pure function of content."""
    import hashlib
    import struct

    n = length // 8
    h = hashlib.md5(_ENC_PAD).digest()
    for _ in range(50):
        h = hashlib.md5(h).digest()
    okey = h[:n]
    o = _wrc4(okey, _ENC_PAD)
    for i in range(1, 20):
        o = _wrc4(bytes(b ^ i for b in okey), o)
    h = hashlib.md5(
        _ENC_PAD + o + struct.pack("<I", _ENC_P & 0xFFFFFFFF) + _ENC_ID0
    ).digest()
    for _ in range(50):
        h = hashlib.md5(h[:n]).digest()
    key = h[:n]
    u = _wrc4(key, hashlib.md5(_ENC_PAD + _ENC_ID0).digest())
    for i in range(1, 20):
        u = _wrc4(bytes(b ^ i for b in key), u)
    u += b"\x00" * 16
    enc_dict = (b"<< /Filter /Standard /V 2 /R 3 /Length %d "
                b"/O <%s> /U <%s> /P %d >>"
                % (length, o.hex().encode(), u.hex().encode(), _ENC_P))
    return key, enc_dict


def _enc_objkey(file_key: bytes, num: int) -> bytes:
    import hashlib

    h = hashlib.md5(
        file_key + num.to_bytes(3, "little") + (0).to_bytes(2, "little")
    ).digest()
    return h[: min(len(file_key) + 5, 16)]


def _esc_bytes(raw: bytes) -> bytes:
    out = bytearray()
    for b in raw:
        if b in (0x5C, 0x28, 0x29):
            out += b"\\" + bytes([b])
        elif b < 32:
            out += b"\\%03o" % b
        else:
            out.append(b)
    return bytes(out)


def build_pdf(pages: list[list[str]], *, mode: str = "tj",
              flate: bool = False, xref_stream: bool = False,
              stream_filter: str | None = None,
              info: dict | None = None,
              encrypt: str | None = None,
              image: dict | None = None) -> bytes:
    """Serialize a complete PDF showing ``pages`` (lists of text lines).

    ``xref_stream=True`` emits a PDF 1.5 file: the dict objects live in
    a ``/Type /ObjStm`` container indexed by a cross-reference stream
    (``/W [1 4 2]``, FlateDecode + PNG Predictor 12); otherwise a
    classic ``xref`` table + ``trailer`` is written.
    ``stream_filter`` selects the content-stream encoding: None,
    "flate", "a85" (ASCII85Decode) or "lzw" (LZWDecode); ``flate=True``
    is the legacy spelling of stream_filter="flate".
    ``image`` (a ``doc_image``-shaped dict) embeds one Image XObject on
    page 0: raw sample bytes go Flate-filtered, "jpeg" content embeds
    as /DCTDecode; the Do operators live in a SECOND /Contents stream
    so the text bytes — and the expected-text sidecars — are untouched.
    """
    if stream_filter is None and flate:
        stream_filter = "flate"
    file_key = enc_dict_body = None
    if encrypt:
        if encrypt != "rc4":
            raise ValueError("pdfgen: only rc4 encryption is implemented")
        file_key, enc_dict_body = _enc_setup()

    def enc_stream(body: bytes) -> tuple[bytes, bytes]:
        if stream_filter == "flate":
            body = zlib.compress(body)
            return (b"<< /Length %d /Filter /FlateDecode >>" % len(body), body)
        if stream_filter == "a85":
            body = ascii85_encode(body)
            return (b"<< /Length %d /Filter /ASCII85Decode >>" % len(body), body)
        if stream_filter == "lzw":
            body = lzw_encode(body)
            return (b"<< /Length %d /Filter /LZWDecode >>" % len(body), body)
        return (b"<< /Length %d >>" % len(body), body)
    n_pages = len(pages)
    cmap_mode = mode in ("cmap", "cmap2")
    two_byte = mode == "cmap2"
    codes = _cmap_codes(pages, two_byte) if cmap_mode else None
    # object numbers: 1 catalog, 2 pages, 3 font, then per page
    # (4+2i page dict, 5+2i content stream); cmap modes append the
    # /ToUnicode stream after the content streams
    page_nums = [4 + 2 * i for i in range(n_pages)]
    content_nums = [5 + 2 * i for i in range(n_pages)]
    tounicode_num = 4 + 2 * n_pages
    kids = b"[" + b" ".join(b"%d 0 R" % p for p in page_nums) + b"]"
    font = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /AAAAAA+Subset "
        b"/ToUnicode %d 0 R >>" % tounicode_num
        if cmap_mode else
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    dict_objs: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids " + kids + b" /Count %d >>" % n_pages,
        3: font,
    }
    for i, pn in enumerate(page_nums):
        dict_objs[pn] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> "
            b"/Contents %d 0 R >>" % content_nums[i])
    streams: dict[int, tuple[bytes, bytes]] = {}  # num -> (dict, body)
    for i, cn in enumerate(content_nums):
        body = (_line_ops_cmap(pages[i], codes, two_byte) if cmap_mode
                else _line_ops(pages[i], mode))
        streams[cn] = enc_stream(body)
    if cmap_mode:
        streams[tounicode_num] = enc_stream(_cmap_stream(codes, two_byte))
    info_num = tounicode_num + (1 if cmap_mode else 0)
    if info:
        # classic-mode strings are encrypted per object; inside an
        # ObjStm (xref_stream mode) strings stay plain — only the
        # container stream is encrypted (PDF 32000 §7.5.7)
        enc_strings = bool(encrypt) and not xref_stream
        body = b"<<"
        for k, v in sorted(info.items()):
            if enc_strings:
                raw = _wrc4(_enc_objkey(file_key, info_num),
                            _encode(str(v)))
                body += (b" /" + k.encode("ascii")
                         + b" (" + _esc_bytes(raw) + b")")
            else:
                body += (b" /" + k.encode("ascii")
                         + b" (" + _esc_lit(str(v)) + b")")
        dict_objs[info_num] = body + b" >>"

    if image:
        img_num = info_num + (1 if info else 0)
        ops_num = img_num + 1
        if image["fmt"] == "jpeg":
            img_body, img_filter = image["content"], b"/DCTDecode"
        else:
            img_body, img_filter = zlib.compress(image["content"]), \
                b"/FlateDecode"
        streams[img_num] = (
            b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
            b"/ColorSpace /%s /BitsPerComponent %d /Filter %s /Length %d >>"
            % (image["width"], image["height"],
               image["color_space"].encode("ascii"), image["bits"],
               img_filter, len(img_body)),
            img_body)
        streams[ops_num] = enc_stream(
            b"q %d 0 0 %d 40 40 cm /%s Do Q"
            % (image["width"], image["height"],
               image["name"].encode("ascii")))
        dict_objs[page_nums[0]] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> "
            b"/XObject << /%s %d 0 R >> >> "
            b"/Contents [%d 0 R %d 0 R] >>"
            % (image["name"].encode("ascii"), img_num,
               content_nums[0], ops_num))

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n" if xref_stream
                    else b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}

    def emit(num: int, payload: bytes) -> None:
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num + payload + b"\nendobj\n")

    def emit_stream(num: int, d: bytes, body: bytes) -> None:
        emit(num, d + b"\nstream\n" + body + b"\nendstream")

    if not xref_stream:
        for num in sorted(dict_objs):
            emit(num, dict_objs[num])
        for num in sorted(streams):
            d, body = streams[num]
            if encrypt:  # encrypt AFTER filtering (reader undoes first)
                body = _wrc4(_enc_objkey(file_key, num), body)
            emit_stream(num, d, body)
        enc_ref = b""
        if encrypt:
            enc_num = max(offsets) + 1
            emit(enc_num, enc_dict_body)
            enc_ref = (b" /Encrypt %d 0 R /ID [<%s> <%s>]"
                       % (enc_num, _ENC_ID0.hex().encode(),
                          _ENC_ID0.hex().encode()))
        max_num = max(offsets) + 1
        xref_off = len(out)
        out.extend(b"xref\n0 %d\n" % max_num)
        out.extend(b"0000000000 65535 f \n")
        for num in range(1, max_num):
            out.extend(b"%010d 00000 n \n" % offsets[num])
        info_ref = b" /Info %d 0 R" % info_num if info else b""
        out.extend(
            b"trailer\n<< /Size %d /Root 1 0 R%s%s >>\nstartxref\n%d\n%%%%EOF\n"
            % (max_num, info_ref, enc_ref, xref_off))
        return bytes(out)

    # -- PDF 1.5: object stream + cross-reference stream ---------------
    for num in sorted(streams):
        d, body = streams[num]
        if encrypt:
            body = _wrc4(_enc_objkey(file_key, num), body)
        emit_stream(num, d, body)
    stm_nums = sorted(dict_objs)  # objects packed into the ObjStm
    header = bytearray()
    bodies = bytearray()
    for num in stm_nums:
        header += b"%d %d " % (num, len(bodies))
        bodies += dict_objs[num] + b"\n"
    objstm_num = max(max(streams), max(dict_objs)) + 1
    # the /Encrypt dict may not live in an object stream (§7.5.7), so
    # it gets its own uncompressed object between ObjStm and XRef
    enc_num = objstm_num + 1 if encrypt else None
    xref_num = objstm_num + (2 if encrypt else 1)
    objstm_body = zlib.compress(bytes(header) + bytes(bodies))
    if encrypt:  # the ObjStm container is a stream like any other
        objstm_body = _wrc4(_enc_objkey(file_key, objstm_num), objstm_body)
    emit_stream(
        objstm_num,
        b"<< /Type /ObjStm /N %d /First %d /Length %d /Filter /FlateDecode >>"
        % (len(stm_nums), len(header), len(objstm_body)),
        objstm_body)
    if encrypt:
        emit(enc_num, enc_dict_body)
    # xref rows: W=[1,4,2] (type, offset/objstm, gen/index)
    size = xref_num + 1
    xref_off = len(out)
    offsets[xref_num] = xref_off
    rows = bytearray()
    for num in range(size):
        if num == 0:
            typ, f2, f3 = 0, 0, 65535
        elif num in dict_objs:
            typ, f2, f3 = 2, objstm_num, stm_nums.index(num)
        else:
            typ, f2, f3 = 1, offsets[num], 0
        rows += bytes([typ]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
    # PNG Predictor 12: per-row filter byte (type 0 = passthrough)
    rowlen = 7
    predicted = bytearray()
    for r in range(0, len(rows), rowlen):
        predicted += b"\x00" + rows[r:r + rowlen]
    xref_body = zlib.compress(bytes(predicted))
    info_ref = b" /Info %d 0 R" % info_num if info else b""
    enc_ref = (b" /Encrypt %d 0 R /ID [<%s> <%s>]"
               % (enc_num, _ENC_ID0.hex().encode(),
                  _ENC_ID0.hex().encode())) if encrypt else b""
    xref_dict = (
        b"<< /Type /XRef /Size %d /Root 1 0 R" % size
        + info_ref + enc_ref
        + b" /W [1 4 2] /Index [0 %d] /Filter /FlateDecode "
          b"/DecodeParms << /Predictor 12 /Columns 7 >> /Length %d >>"
        % (size, len(xref_body))
    )
    emit_stream(xref_num, xref_dict, xref_body)
    out.extend(b"startxref\n%d\n%%%%EOF\n" % xref_off)
    return bytes(out)


# ---------------------------------------------------------------------
# fixture corpus
# ---------------------------------------------------------------------

_MODES = ("tj", "tjarr", "quote", "hex", "cmap", "cmap2")


def doc_pages(i: int, grammar: bool = False) -> list[list[str]]:
    """Deterministic text for fixture doc ``i`` — exercises parens,
    backslashes, control-char octal escapes, and Latin-1 bytes.
    ``grammar=True`` appends extraction-grammar sentences (ontology.py
    templates) so the PDFs yield real triples through stages B-D."""
    lines = [
        f"Paper {i}: intervention (RLHF v{i % 3}) improves safety",
        f"metrics[{i}] = {i * 3 + 1}; jaccard > 0.5 \\ baseline",
        f"Evaluación número {i} — café",
        f"tab\tseparated\tfields {i}",
        f"links [node {i}] and [concept {i % 4}] directly",
    ]
    if grammar:
        from .ontology import CONFIDENCE_WORDS, EDGE_PHRASES

        phrase = sorted(EDGE_PHRASES)[i % len(EDGE_PHRASES)]
        conf = sorted(CONFIDENCE_WORDS)[i % len(CONFIDENCE_WORDS)]
        lines += [
            f"Logical chain <chain {i}> proceeds as follows.",
            f"Evidence shows that [method {i}] {phrase} [risk {i % 3}]"
            f" with {conf} confidence because study {i} measured it.",
            f"Concept [risk {i % 3}] (category: failure-mode; aka: none)"
            f" is defined as a measured failure mode {i % 3}.",
        ]
    if i % 5 == 0:  # multi-page docs
        return [lines[:2], lines[2:] + [f"appendix page for doc {i}"]]
    return [lines]


def expected_text(i: int, grammar: bool = False) -> str:
    return "\n".join("\n".join(pg) for pg in doc_pages(i, grammar=grammar))


_FILTERS = (None, "flate", "a85", "lzw")


def doc_image(i: int) -> dict:
    """Deterministic embedded image for fixture doc ``i`` — every
    property is a pure function of the index, mirrored term-for-term by
    the s1_pdf_images oracle SQL: every 4th doc embeds real JFIF bytes
    (operators/jpeg.encode_jpeg, /DCTDecode passthrough), the rest are
    Flate-filtered raw samples, gray or RGB."""
    w = 8 + (i % 5) * 4
    h = 6 + (i % 3) * 4
    jpeg = i % 4 == 2
    gray = (not jpeg) and i % 3 == 0
    if jpeg:
        import numpy as np

        from .operators.jpeg import encode_jpeg

        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([(xx * 7 + i) % 256, (yy * 13 + i * 3) % 256,
                        (xx * 3 + yy * 5) % 256], axis=-1).astype(np.uint8)
        content = encode_jpeg(img, quality=90)
    else:
        px = bytearray()
        for y in range(h):
            for x in range(w):
                if gray:
                    px.append((x * 7 + y * 13 + i * 5) % 256)
                else:
                    px += bytes(((x * 7 + i) % 256, (y * 13 + i * 3) % 256,
                                 (x * 3 + y * 5) % 256))
        content = bytes(px)
    return {"name": "Im0", "width": w, "height": h, "bits": 8,
            "color_space": "DeviceGray" if gray else "DeviceRGB",
            "fmt": "jpeg" if jpeg else "raw", "content": content}


def build_doc(i: int, grammar: bool = False) -> bytes:
    return build_pdf(
        doc_pages(i, grammar=grammar),
        mode=_MODES[i % len(_MODES)],
        stream_filter=_FILTERS[i % len(_FILTERS)],
        xref_stream=(i % 3 == 0),
        info={"Title": f"Paper {i}: safety interventions",
              "Author": f"Author {i % 5} (lab'{i})"},
        # every 5th doc is RC4-encrypted (empty user password), so the
        # s1_pdf_docs ORACLE — not just pytest — grades the decryption
        # path: key derivation, per-object keys, stream + /Info string
        # decryption, across both xref layouts
        encrypt="rc4" if i % 5 == 2 else None,
        # one embedded image per doc: the s1_pdf_images oracle grades
        # XObject extraction (incl. decrypting image streams — doc 2
        # is an ENCRYPTED DCTDecode) against expected_images sidecars
        image=doc_image(i),
    )


def ensure_pdf_fixture(dirpath: str, n_docs: int = 16,
                       grammar: bool = False) -> str:
    """Write ``doc_###.pdf`` + ``expected/doc_###.txt`` pairs; content
    is a pure function of the index so repeated calls are no-ops.
    ``grammar=True`` writes the triples-bearing corpus variant (the
    end-to-end PDF→KG fixture)."""
    d = pathlib.Path(dirpath)
    (d / "expected").mkdir(parents=True, exist_ok=True)
    for i in range(n_docs):
        pdf = d / f"doc_{i:03d}.pdf"
        data = build_doc(i, grammar=grammar)
        if not pdf.exists() or pdf.read_bytes() != data:
            pdf.write_bytes(data)
        txt = d / "expected" / f"doc_{i:03d}.txt"
        body = expected_text(i, grammar=grammar)
        if not txt.exists() or txt.read_text(encoding="utf-8") != body:
            txt.write_text(body, encoding="utf-8")
        im = doc_image(i)
        blob = d / "expected_images" / f"doc_{i:03d}_p0_{im['name']}.bin"
        blob.parent.mkdir(exist_ok=True)
        if not blob.exists() or blob.read_bytes() != im["content"]:
            blob.write_bytes(im["content"])
    return str(d)


# -- extra stream filters (writer side, round-trip fixtures) ----------

def ascii85_encode(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 4):
        chunk = data[i:i + 4]
        n = len(chunk)
        v = int.from_bytes(chunk + b"\x00" * (4 - n), "big")
        if v == 0 and n == 4:
            out += b"z"
            continue
        digits = []
        for _ in range(5):
            digits.append(v % 85)
            v //= 85
        enc = bytes(0x21 + d for d in reversed(digits))
        out += enc[: n + 1]
    return bytes(out) + b"~>"


def lzw_encode(data: bytes) -> bytes:
    """TIFF/PDF-variant LZW (EarlyChange=1): emits Clear, data codes
    with 9→12-bit width bumps aligned to the decoder's table growth,
    and EOD; table resets before overflow."""
    codes: list[tuple[int, int]] = []
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    codes.append((256, width))
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        codes.append((table[w], width))
        table[wc] = next_code
        next_code += 1
        # EarlyChange=1 (TIFF/PDF convention, matching pdfminer/qpdf):
        # the decoder widens one entry early, when its table reaches
        # 511/1023/2047.  Its table lags the encoder's next_code by one
        # (decoder len = next_code - 1), so the encoder widens when
        # next_code itself crosses 2^width.
        if next_code >= (1 << width) and width < 12:
            width += 1
        if next_code >= 4095:  # reset before the 12-bit table fills
            codes.append((256, width))
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([byte])
    if w:
        codes.append((table[w], width))
    codes.append((257, width))
    acc = 0
    nbits = 0
    out = bytearray()
    for code, cw in codes:
        acc = (acc << cw) | code
        nbits += cw
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# -- heavy corpus (decode-bound benchmarking) -------------------------

_HEAVY_VOCAB = (
    "alignment safety intervention scaling oversight deception reward "
    "model policy evaluation interpretability robustness corrigibility "
    "optimization gradient transformer attention embedding latent "
    "feedback circuit"
).split()


def heavy_doc_pages(i: int, n_pages: int = 24,
                    n_lines: int = 48) -> list[list[str]]:
    """Multi-page pseudo-paper text, a pure function of ``i``: LCG-
    picked vocabulary with interleaved numbers so Flate cannot crush
    it to nothing (~140 KB raw / ~37 KB compressed per doc) — the
    corpus shape that makes the PDF bench decode-bound instead of
    listing-bound (r4 VERDICT observation #2)."""
    pages = []
    state = (i * 2654435761) & 0xFFFFFFFF
    for _p in range(n_pages):
        lines = []
        for _l in range(n_lines):
            ws = []
            for k in range(11):
                state = (state * 1103515245 + 12345) & 0x7FFFFFFF
                ws.append(_HEAVY_VOCAB[state % len(_HEAVY_VOCAB)])
                if k % 4 == 3:
                    ws.append(str(state % 99991))
            lines.append(" ".join(ws))
        pages.append(lines)
    return pages


_HEAVY_FILTERS = ("flate", "flate", "flate", "flate", None, "a85")


def ensure_heavy_pdf_fixture(dirpath: str, n_docs: int = 3000,
                             n_pages: int = 24) -> str:
    """Write a decode-bound PDF corpus (default ~110 MB across 3000
    multi-page files; Flate-dominated like real pdfTeX output, with
    uncompressed and ASCII85 minorities).  Existence-checked per file:
    generation is a one-time ~1 min cost, the bench reads only."""
    import pathlib

    import shutil

    def gen(i: int) -> bytes:
        return build_pdf(
            heavy_doc_pages(i, n_pages=n_pages),
            mode=_MODES[i % 3],  # tj / tjarr / quote
            stream_filter=_HEAVY_FILTERS[i % len(_HEAVY_FILTERS)],
            xref_stream=(i % 3 == 0),
            info={"Title": f"Heavy paper {i}", "Author": f"Author {i % 7}"},
        )

    d = pathlib.Path(dirpath)
    # staleness sentinel: per-file existence checks would silently keep
    # serving bytes from a PREVIOUS generator/codec version (exactly the
    # failure mode of the r5 LZW convention change) — if file 0 doesn't
    # byte-match the current generator, the whole corpus is rebuilt
    probe = d / "doc_00000.pdf"
    if probe.exists() and probe.read_bytes() != gen(0):
        shutil.rmtree(d)
    d.mkdir(parents=True, exist_ok=True)
    for i in range(n_docs):
        p = d / f"doc_{i:05d}.pdf"
        if not p.exists():
            p.write_bytes(gen(i))
    return str(d)
