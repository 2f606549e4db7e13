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


# -- encrypted fixtures (PDF 32000 §7.6.3, standard security handler) --

ENC_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E,
    0x56, 0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68,
    0x3E, 0x80, 0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def rc4(key, data):
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


def encrypt_pdf_fixture(text_ops: bytes, r: int = 3, length: int = 128,
                         p: int = -44, method: str = "rc4"):
    """Spec-side (writer) implementation of Algorithms 2/3/5, written
    from PDF 32000 §7.6.3 independently of operators/pdf.py: derives
    O for empty owner password, the file key for empty user password,
    U, and RC4-encrypts the content stream per-object."""
    import hashlib
    import struct

    id0 = bytes(range(16))
    n = 5 if r == 2 else length // 8
    # Algorithm 3: /O from the (empty) owner password
    h = hashlib.md5(ENC_PAD).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    okey = h[:n]
    o = rc4(okey, ENC_PAD)
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in okey), o)
    # Algorithm 2: file key for the empty user password
    h = hashlib.md5(
        ENC_PAD + o + struct.pack("<I", p & 0xFFFFFFFF) + id0
    ).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    key = h[:n]
    # Algorithm 4/5: /U
    if r == 2:
        u = rc4(key, ENC_PAD)
    else:
        u = rc4(key, hashlib.md5(ENC_PAD + id0).digest())
        for i in range(1, 20):
            u = rc4(bytes(b ^ i for b in key), u)
        u = u + b"\x00" * 16

    def objkey(num, gen=0):
        return hashlib.md5(
            key + num.to_bytes(3, "little") + gen.to_bytes(2, "little")
        ).digest()[: min(n + 5, 16)]

    # content stream is object 4 in the simple_doc_objects scaffold
    if method == "aes":
        import hashlib as _hl

        akey = _hl.md5(
            key + (4).to_bytes(3, "little") + (0).to_bytes(2, "little")
            + b"sAlT").digest()[: min(n + 5, 16)]
        enc_cs = aes_cbc_encrypt(akey, text_ops, iv=bytes(range(16)))
    else:
        enc_cs = rc4(objkey(4), text_ops)
    objs = simple_doc_objects(enc_cs)
    if method == "aes":
        objs[5] = (b"<< /Filter /Standard /V 4 /R 4 /Length %d "
                   b"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
                   b"/StmF /StdCF /StrF /StdCF "
                   b"/O <%s> /U <%s> /P %d >>"
                   % (length, o.hex().encode(), u.hex().encode(), p))
    else:
        v = 1 if r == 2 else 2
        objs[5] = (b"<< /Filter /Standard /V %d /R %d /Length %d "
                   b"/O <%s> /U <%s> /P %d >>"
                   % (v, r, length, o.hex().encode(), u.hex().encode(), p))
    trailer = (b"<< /Size 7 /Root 1 0 R /Encrypt 5 0 R /ID [<%s> <%s>] >>"
               % (id0.hex().encode(), id0.hex().encode()))
    return build_classic(objs, trailer), key, objkey


# -- forward AES-128 (FIPS-197) for AESV2 fixture encryption ----------

_SBOX = None


def _sbox():
    global _SBOX
    if _SBOX is None:
        # affine map over GF(2^8) inverses (generator walk)
        box = [0] * 256
        p = q = 1
        while True:
            p = p ^ ((p << 1) & 0xFF) ^ (0x1B if p & 0x80 else 0)
            q ^= q << 1
            q ^= q << 2
            q ^= q << 4
            q &= 0xFF
            if q & 0x80:
                q ^= 0x09
            x = (q ^ (q << 1) ^ (q >> 7) ^ (q << 2) ^ (q >> 6)
                 ^ (q << 3) ^ (q >> 5) ^ (q << 4) ^ (q >> 4))
            box[p] = (x ^ 0x63) & 0xFF
            if p == 1:
                break
        box[0] = 0x63
        _SBOX = box
    return _SBOX


def _aes_keys(key):
    sb = _sbox()
    rcon = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]
    nk = len(key) // 4
    nr = nk + 6
    w = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = [sb[b] for b in t[1:] + t[:1]]
            t[0] ^= rcon[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [sb[b] for b in t]
        w.append([w[i - nk][j] ^ t[j] for j in range(4)])
    return [[b for c in range(4) for b in w[4 * r + c]]
            for r in range(nr + 1)]


def _xt(a):
    return ((a << 1) ^ 0x1B) & 0xFF if a & 0x80 else a << 1


def _aes_encrypt_block(block, rks):
    sb = _sbox()
    nr = len(rks) - 1
    s = [block[i] ^ rks[0][i] for i in range(16)]
    for rnd in range(1, nr + 1):
        s = [sb[b] for b in s]                       # SubBytes
        s = [s[(i + 4 * (i % 4)) % 16] for i in range(16)]  # ShiftRows
        if rnd != nr:                                # MixColumns
            t = []
            for c in range(4):
                a = s[4 * c:4 * c + 4]
                t += [
                    _xt(a[0]) ^ _xt(a[1]) ^ a[1] ^ a[2] ^ a[3],
                    a[0] ^ _xt(a[1]) ^ _xt(a[2]) ^ a[2] ^ a[3],
                    a[0] ^ a[1] ^ _xt(a[2]) ^ _xt(a[3]) ^ a[3],
                    _xt(a[0]) ^ a[0] ^ a[1] ^ a[2] ^ _xt(a[3]),
                ]
            s = t
        s = [s[i] ^ rks[rnd][i] for i in range(16)]  # AddRoundKey
    return bytes(s)


def aes_cbc_encrypt(key, data, iv=b"\x00" * 16):
    """AESV2 writer side: PKCS#5 pad, CBC, prefix the IV."""
    rks = _aes_keys(key)
    pad = 16 - (len(data) % 16)
    data = data + bytes([pad]) * pad
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i:i + 16], prev))
        prev = _aes_encrypt_block(blk, rks)
        out += prev
    return bytes(out)


def aes_cbc_encrypt_nopad(key, iv, data):
    rks = _aes_keys(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i:i + 16], prev))
        prev = _aes_encrypt_block(blk, rks)
        out += prev
    return bytes(out)


def algo2b(pwd: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """PDF 2.0 Algorithm 2.B (R6 KDF) — independent writer-side
    implementation from the spec text."""
    import hashlib

    K = hashlib.sha256(pwd + salt + udata).digest()
    rnd = 0
    while True:
        k1 = (pwd + K + udata) * 64
        e = aes_cbc_encrypt_nopad(K[:16], K[16:32], k1)
        K = (hashlib.sha256, hashlib.sha384,
             hashlib.sha512)[sum(e[:16]) % 3](e).digest()
        rnd += 1
        if rnd >= 64 and e[-1] <= rnd - 32:
            return K[:32]


def encrypt_pdf_fixture_v5(text_ops: bytes, r: int = 6):
    """AES-256 (V5) fixture: /U from the empty user password (R6 =
    Algorithm 2.B, R5 = plain SHA-256), file key wrapped into /UE,
    content stream AES-256-CBC with IV prefix + PKCS#5 pad."""
    import hashlib

    file_key = bytes(range(32))
    vsalt = b"VSALTvs8"
    ksalt = b"KSALTks8"
    if r == 6:
        uhash = algo2b(b"", vsalt)
        ik = algo2b(b"", ksalt)
    else:
        uhash = hashlib.sha256(vsalt).digest()
        ik = hashlib.sha256(ksalt).digest()
    u = uhash + vsalt + ksalt
    ue = aes_cbc_encrypt_nopad(ik, b"\x00" * 16, file_key)
    enc_cs = aes_cbc_encrypt(file_key, text_ops, iv=bytes(range(16)))
    objs = simple_doc_objects(enc_cs)
    objs[5] = (b"<< /Filter /Standard /V 5 /R %d /Length 256 "
               b"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
               b"/StmF /StdCF /StrF /StdCF /P -44 "
               b"/U <%s> /UE <%s> /O <%s> /OE <%s> >>"
               % (r, u.hex().encode(), ue.hex().encode(),
                  (b"\x00" * 48).hex().encode(),
                  (b"\x00" * 32).hex().encode()))
    trailer = b"<< /Size 7 /Root 1 0 R /Encrypt 5 0 R >>"
    return build_classic(objs, trailer), file_key
