"""Minimal pure-python PDF text extraction — the in-sandbox default for
the reference's PDF ingestion path (process_text_file.py:63-94, where
MarkItDown does the byte decode).  This is NOT a full PDF renderer; it is
a text extractor sized to scientific-paper PDFs:

* object scan (no xref needed): every ``N G obj … endobj`` is parsed,
  including /Type/ObjStm compressed object streams;
* FlateDecode (zlib) with optional PNG predictors;
* page tree walk (/Root → /Pages → /Kids) for correct page order, with a
  by-object-number fallback when the trailer is absent;
* per-page font map: /ToUnicode CMaps (bfchar + bfrange, 1- and 2-byte
  codes) and /Encoding /Differences glyph names (Adobe Glyph List subset
  + ``uniXXXX``), defaulting to Latin-1 for unmapped simple fonts;
* content-stream interpreter for the text operators (BT/ET, Tf, Td, TD,
  T*, Tm, Tj, TJ, ', ") — TJ kerning gaps become spaces, line motions
  become newlines.

Anything it cannot decode degrades to skipped glyphs, never an exception
mid-pipeline; wholly unparseable input raises ValueError at the caller
(kgray.sources.textfile.decode_payload keeps the pluggable
``set_pdf_extractor`` seam, so a real MarkItDown/pdfminer install still
takes precedence).
"""
from __future__ import annotations

import re
import zlib
from typing import Dict, List, Optional, Tuple

# ---------------------------------------------------------------------------
# object model
# ---------------------------------------------------------------------------


class Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num

    def __repr__(self):  # pragma: no cover - debug aid
        return f"Ref({self.num})"


class Name(str):
    """PDF name object (distinct from a decoded string)."""


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


def _skip_ws(data: bytes, i: int) -> int:
    n = len(data)
    while i < n:
        c = data[i : i + 1]
        if c in (b"%",):  # comment to EOL
            while i < n and data[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c in _WS:
            i += 1
        else:
            break
    return i


_NAME_ESC = re.compile(rb"#([0-9A-Fa-f]{2})")


def _parse_name(data: bytes, i: int) -> Tuple[Name, int]:
    i += 1  # '/'
    start = i
    n = len(data)
    while i < n and data[i : i + 1] not in _WS and data[i : i + 1] not in _DELIM:
        i += 1
    raw = _NAME_ESC.sub(lambda m: bytes([int(m.group(1), 16)]), data[start:i])
    return Name(raw.decode("latin-1")), i


_OCTAL = {48, 49, 50, 51, 52, 53, 54, 55}


def _parse_literal_string(data: bytes, i: int) -> Tuple[bytes, int]:
    i += 1  # '('
    depth = 1
    out = bytearray()
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _OCTAL:
                oct_digits = bytearray([e])
                i += 1
                while i < n and len(oct_digits) < 3 and data[i] in _OCTAL:
                    oct_digits.append(data[i])
                    i += 1
                out.append(int(oct_digits.decode(), 8) & 0xFF)
                continue
            mapped = {
                0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09,
                0x62: 0x08, 0x66: 0x0C,
            }.get(e)
            if mapped is not None:
                out.append(mapped)
            elif e in (0x0A, 0x0D):  # line continuation
                if e == 0x0D and i + 1 < n and data[i + 1] == 0x0A:
                    i += 1
            else:
                out.append(e)
            i += 1
        elif c == 0x28:  # '('
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:  # ')'
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


def _parse_hex_string(data: bytes, i: int) -> Tuple[bytes, int]:
    i += 1  # '<'
    end = data.index(b">", i)
    hexs = re.sub(rb"[^0-9A-Fa-f]", b"", data[i:end])
    if len(hexs) % 2:
        hexs += b"0"
    return bytes.fromhex(hexs.decode()), end + 1


_NUM_RE = re.compile(rb"[+-]?\d*\.?\d+")
_REF_RE = re.compile(rb"(\d+)\s+(\d+)\s+R\b")


def parse_object(data: bytes, i: int):
    """Parse one PDF object at ``i`` → (obj, next_pos).  Strings come back
    as bytes, names as Name, dicts as {Name: obj}, references as Ref."""
    i = _skip_ws(data, i)
    if i >= len(data):
        raise ValueError("unexpected end of data")
    c = data[i : i + 1]
    if c == b"/":
        return _parse_name(data, i)
    if c == b"(":
        return _parse_literal_string(data, i)
    if c == b"<":
        if data[i : i + 2] == b"<<":
            i += 2
            d: Dict[Name, object] = {}
            while True:
                i = _skip_ws(data, i)
                if i >= len(data):  # unterminated dict
                    return d, i
                if data[i : i + 2] == b">>":
                    return d, i + 2
                key, i = _parse_name(data, i)
                val, i = parse_object(data, i)
                d[key] = val
        return _parse_hex_string(data, i)
    if c == b"[":
        i += 1
        arr: List[object] = []
        n = len(data)
        while True:
            i = _skip_ws(data, i)
            if i >= n or len(arr) > 65536:  # unterminated / binary garbage
                return arr, i
            if data[i : i + 1] == b"]":
                return arr, i + 1
            v, i = parse_object(data, i)
            arr.append(v)
    m = _REF_RE.match(data, i)
    if m:
        return Ref(int(m.group(1))), m.end()
    m = _NUM_RE.match(data, i)
    if m:
        tok = m.group(0)
        val = float(tok) if b"." in tok else int(tok)
        return val, m.end()
    for lit, val in ((b"true", True), (b"false", False), (b"null", None)):
        if data[i : i + len(lit)] == lit:
            return val, i + len(lit)
    # bare keyword (operator) — callers in content streams handle these
    start = i
    n = len(data)
    while i < n and data[i : i + 1] not in _WS and data[i : i + 1] not in _DELIM:
        i += 1
    if i == start:
        i += 1  # unknown delimiter; skip a byte rather than loop forever
    return Name(data[start:i].decode("latin-1")), i


# ---------------------------------------------------------------------------
# document scan
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_RE = re.compile(rb"stream\r?\n")


def _lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """PDF LZWDecode: 9→12-bit variable codes, 256 = clear, 257 = EOD,
    code width bumps ``early_change`` entries before the table fills."""
    out = bytearray()
    table: List[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: Optional[bytes] = None
    bitbuf = 0
    nbits = 0
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            if len(table) >= (1 << width) - early_change and width < 12:
                width += 1
    return bytes(out)


def _png_unpredict(data: bytes, colors: int, columns: int) -> bytes:
    row = columns * colors
    out = bytearray()
    prev = bytearray(row)
    i = 0
    while i + 1 + row <= len(data) + row:  # tolerate a short final row
        ft = data[i]
        raw = bytearray(data[i + 1 : i + 1 + row])
        i += 1 + row
        if ft == 1:
            for j in range(colors, len(raw)):
                raw[j] = (raw[j] + raw[j - colors]) & 0xFF
        elif ft == 2:
            for j in range(len(raw)):
                raw[j] = (raw[j] + prev[j]) & 0xFF
        elif ft == 3:
            for j in range(len(raw)):
                left = raw[j - colors] if j >= colors else 0
                raw[j] = (raw[j] + ((left + prev[j]) >> 1)) & 0xFF
        elif ft == 4:
            for j in range(len(raw)):
                a = raw[j - colors] if j >= colors else 0
                b = prev[j]
                cc = prev[j - colors] if j >= colors else 0
                p = a + b - cc
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else cc)
                raw[j] = (raw[j] + pred) & 0xFF
        out += raw
        prev = raw
        if i >= len(data):
            break
    return bytes(out)


class PdfDoc:
    def __init__(self, data: bytes):
        self.data = data
        self.objs: Dict[int, object] = {}
        self.streams: Dict[int, bytes] = {}  # raw (still encoded)
        self._scan()
        self._expand_objstm()

    # -- object resolution ---------------------------------------------------
    def resolve(self, obj, depth: int = 0):
        while isinstance(obj, Ref) and depth < 32:
            obj = self.objs.get(obj.num)
            depth += 1
        return obj

    def _scan(self) -> None:
        data = self.data
        for m in _OBJ_RE.finditer(data):
            num = int(m.group(1))
            try:
                obj, pos = parse_object(data, m.end())
            except Exception:
                continue
            self.objs[num] = obj
            sm = _STREAM_RE.match(data, _skip_ws(data, pos))
            if sm and isinstance(obj, dict):
                start = sm.end()
                length = obj.get("Length")
                if isinstance(length, Ref):
                    length = None  # resolve later is circular; fall back
                if isinstance(length, int) and data[
                    start + length : start + length + 32
                ].lstrip().startswith(b"endstream"):
                    raw = data[start : start + length]
                else:
                    end = data.find(b"endstream", start)
                    raw = data[start:end].rstrip(b"\r\n") if end != -1 else b""
                self.streams[num] = raw

    def stream_bytes(self, num: int) -> bytes:
        """Decoded stream contents for object ``num``."""
        obj = self.objs.get(num)
        raw = self.streams.get(num, b"")
        if not isinstance(obj, dict):
            return raw
        filt = self.resolve(obj.get("Filter"))
        filters = filt if isinstance(filt, list) else ([filt] if filt else [])
        parms = self.resolve(obj.get("DecodeParms"))
        parms_list = parms if isinstance(parms, list) else [parms]
        out = raw
        for k, f in enumerate(filters):
            f = self.resolve(f)
            if f == "FlateDecode":
                try:
                    out = zlib.decompress(out)
                except zlib.error:
                    try:  # truncated stream: salvage what inflates
                        out = zlib.decompressobj().decompress(out)
                    except zlib.error:
                        return b""
                p = self.resolve(parms_list[k]) if k < len(parms_list) else None
                if isinstance(p, dict) and self.resolve(p.get("Predictor", 1)) and int(
                    self.resolve(p.get("Predictor", 1)) or 1
                ) >= 10:
                    out = _png_unpredict(
                        out,
                        int(self.resolve(p.get("Colors", 1)) or 1),
                        int(self.resolve(p.get("Columns", 1)) or 1),
                    )
            elif f == "LZWDecode":
                p = self.resolve(parms_list[k]) if k < len(parms_list) else None
                early = 1
                if isinstance(p, dict):
                    early = int(self.resolve(p.get("EarlyChange", 1)) or 1)
                try:
                    out = _lzw_decode(out, early_change=early)
                except Exception:
                    return b""
                if isinstance(p, dict) and int(
                    self.resolve(p.get("Predictor", 1)) or 1
                ) >= 10:
                    out = _png_unpredict(
                        out,
                        int(self.resolve(p.get("Colors", 1)) or 1),
                        int(self.resolve(p.get("Columns", 1)) or 1),
                    )
            elif f in ("ASCIIHexDecode",):
                hexs = re.sub(rb"[^0-9A-Fa-f]", b"", out.rstrip(b">"))
                if len(hexs) % 2:
                    hexs += b"0"
                out = bytes.fromhex(hexs.decode())
            else:  # unsupported filter (DCT/LZW/…): not text-bearing
                return b""
        return out

    def _expand_objstm(self) -> None:
        for num, obj in list(self.objs.items()):
            if not (isinstance(obj, dict) and obj.get("Type") == "ObjStm"):
                continue
            content = self.stream_bytes(num)
            if not content:
                continue
            n = int(self.resolve(obj.get("N", 0)) or 0)
            first = int(self.resolve(obj.get("First", 0)) or 0)
            pairs: List[Tuple[int, int]] = []
            i = 0
            for _ in range(n):
                i = _skip_ws(content, i)
                m1 = _NUM_RE.match(content, i)
                if not m1:
                    break
                i = _skip_ws(content, m1.end())
                m2 = _NUM_RE.match(content, i)
                if not m2:
                    break
                i = m2.end()
                pairs.append((int(m1.group(0)), int(m2.group(0))))
            for onum, off in pairs:
                try:
                    parsed, _ = parse_object(content, first + off)
                except Exception:
                    continue
                self.objs.setdefault(onum, parsed)

    # -- page tree -----------------------------------------------------------
    def pages(self) -> List[dict]:
        root = None
        tm = re.search(rb"/Root\s+(\d+)\s+\d+\s+R", self.data)
        if tm:
            root = self.resolve(Ref(int(tm.group(1))))
        if not isinstance(root, dict):
            for obj in self.objs.values():
                if isinstance(obj, dict) and obj.get("Type") == "Catalog":
                    root = obj
                    break
        out: List[dict] = []
        if isinstance(root, dict):
            seen = set()

            def walk(node, depth=0):
                node = self.resolve(node)
                if not isinstance(node, dict) or depth > 64 or id(node) in seen:
                    return
                seen.add(id(node))
                if node.get("Type") == "Page":
                    out.append(node)
                    return
                kids = self.resolve(node.get("Kids"))
                if isinstance(kids, list):
                    for k in kids:
                        walk(k, depth + 1)

            walk(root.get("Pages"))
        if not out:  # damaged trailer: fall back to object-number order
            for num in sorted(self.objs):
                o = self.objs[num]
                if isinstance(o, dict) and o.get("Type") == "Page":
                    out.append(o)
        return out


# ---------------------------------------------------------------------------
# encodings
# ---------------------------------------------------------------------------

# Adobe Glyph List subset covering Latin scientific text + common ligatures
_AGL: Dict[str, str] = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~", "quoteleft": "‘",
    "quoteright": "’", "quotedblleft": "“",
    "quotedblright": "”", "endash": "–", "emdash": "—",
    "bullet": "•", "dagger": "†", "daggerdbl": "‡",
    "fi": "fi", "fl": "fl", "ff": "ff", "ffi": "ffi", "ffl": "ffl",
    "degree": "°", "plusminus": "±", "multiply": "×",
    "divide": "÷", "mu": "μ", "alpha": "α",
    "beta": "β", "gamma": "γ", "delta": "δ",
    "epsilon": "ε", "kappa": "κ", "lambda": "λ",
    "sigma": "σ", "tau": "τ", "phi": "φ", "chi": "χ",
    "omega": "ω", "Delta": "Δ", "minus": "−",
    "registered": "®", "copyright": "©", "trademark": "™",
    "ellipsis": "…", "percentsign": "%", "germandbls": "ß",
    "adieresis": "ä", "odieresis": "ö", "udieresis": "ü",
    "eacute": "é", "egrave": "è", "agrave": "à",
    "ccedilla": "ç", "ntilde": "ñ",
}
for _ch in "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ":
    _AGL[_ch] = _ch


def _glyph_to_unicode(name: str) -> str:
    if name in _AGL:
        return _AGL[name]
    if name.startswith("uni") and len(name) >= 7:
        try:
            return chr(int(name[3:7], 16))
        except ValueError:
            return ""
    if len(name) == 1:
        return name
    return ""


class FontCodec:
    """Per-font code→unicode mapping: ToUnicode CMap wins, then
    /Differences glyph names, then Latin-1 passthrough."""

    def __init__(self, two_byte: bool = False):
        self.two_byte = two_byte
        self.cmap: Dict[int, str] = {}
        self.diff: Dict[int, str] = {}

    def decode(self, raw: bytes) -> str:
        step = 2 if self.two_byte else 1
        out = []
        for i in range(0, len(raw) - (step - 1), step):
            code = int.from_bytes(raw[i : i + step], "big")
            if code in self.cmap:
                out.append(self.cmap[code])
            elif code in self.diff:
                out.append(self.diff[code])
            elif not self.two_byte:
                out.append(bytes([code]).decode("latin-1"))
            # unmapped 2-byte codes are skipped, not garbled
        return "".join(out)


_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEX_TOKEN = re.compile(rb"<([0-9A-Fa-f]+)>")
_CODESPACE_RE = re.compile(
    rb"begincodespacerange\s*<([0-9A-Fa-f]+)>", re.S
)


def _utf16_hex(h: bytes) -> str:
    b = bytes.fromhex(h.decode())
    if len(b) % 2 == 0 and len(b) >= 2:
        try:
            return b.decode("utf-16-be")
        except UnicodeDecodeError:
            pass
    return b.decode("latin-1")


def parse_tounicode(cmap_bytes: bytes) -> FontCodec:
    m = _CODESPACE_RE.search(cmap_bytes)
    two_byte = bool(m and len(m.group(1)) >= 4)
    codec = FontCodec(two_byte=two_byte)
    for block in _BFCHAR_RE.findall(cmap_bytes):
        toks = _HEX_TOKEN.findall(block)
        for j in range(0, len(toks) - 1, 2):
            codec.cmap[int(toks[j], 16)] = _utf16_hex(toks[j + 1])
    for block in _BFRANGE_RE.findall(cmap_bytes):
        # two forms: <lo> <hi> <dst>  |  <lo> <hi> [<d0> <d1> …]
        i = 0
        n = len(block)
        while i < n:
            mlo = _HEX_TOKEN.search(block, i)
            if not mlo:
                break
            mhi = _HEX_TOKEN.search(block, mlo.end())
            if not mhi:
                break
            i = mhi.end()
            lo, hi = int(mlo.group(1), 16), int(mhi.group(1), 16)
            j = i
            while j < n and block[j : j + 1] in _WS:
                j += 1
            if block[j : j + 1] == b"[":
                end = block.find(b"]", j)
                dsts = _HEX_TOKEN.findall(block[j:end])
                for k, d in enumerate(dsts):
                    codec.cmap[lo + k] = _utf16_hex(d)
                i = end + 1
            else:
                mdst = _HEX_TOKEN.search(block, j)
                if not mdst:
                    break
                base = mdst.group(1)
                basev = int(base, 16)
                for k in range(hi - lo + 1):
                    bs = f"{basev + k:0{len(base)}x}".encode()
                    codec.cmap[lo + k] = _utf16_hex(bs)
                i = mdst.end()
    return codec


# ---------------------------------------------------------------------------
# content-stream text interpreter
# ---------------------------------------------------------------------------

_TEXT_OPS = {"Tj", "TJ", "'", '"', "Tf", "Td", "TD", "T*", "Tm", "BT", "ET"}


def _page_fonts(doc: PdfDoc, page: dict) -> Dict[str, FontCodec]:
    fonts: Dict[str, FontCodec] = {}
    res = doc.resolve(page.get("Resources"))
    if not isinstance(res, dict):
        return fonts
    fdict = doc.resolve(res.get("Font"))
    if not isinstance(fdict, dict):
        return fonts
    for fname, fref in fdict.items():
        fobj = doc.resolve(fref)
        if not isinstance(fobj, dict):
            continue
        codec: Optional[FontCodec] = None
        tu = fobj.get("ToUnicode")
        if isinstance(tu, Ref):
            cm = doc.stream_bytes(tu.num)
            if cm:
                codec = parse_tounicode(cm)
        if codec is None:
            codec = FontCodec(two_byte=fobj.get("Subtype") == "Type0")
        enc = doc.resolve(fobj.get("Encoding"))
        if isinstance(enc, dict):
            diffs = doc.resolve(enc.get("Differences"))
            if isinstance(diffs, list):
                code = 0
                for item in diffs:
                    if isinstance(item, (int, float)):
                        code = int(item)
                    elif isinstance(item, Name):
                        codec.diff[code] = _glyph_to_unicode(str(item))
                        code += 1
        fonts[str(fname)] = codec
    return fonts


def _page_content(doc: PdfDoc, page: dict) -> bytes:
    contents = page.get("Contents")
    refs: List[Ref] = []
    if isinstance(contents, Ref):
        inner = doc.resolve(contents)
        if isinstance(inner, list):
            refs = [r for r in inner if isinstance(r, Ref)]
        else:
            refs = [contents]
    elif isinstance(contents, list):
        refs = [r for r in contents if isinstance(r, Ref)]
    return b"\n".join(doc.stream_bytes(r.num) for r in refs)


def _extract_page_text(content: bytes, fonts: Dict[str, FontCodec]) -> str:
    out: List[str] = []
    cur: Optional[FontCodec] = None
    default = FontCodec()
    i, n = 0, len(content)
    stack: List[object] = []
    while i < n:
        i = _skip_ws(content, i)
        if i >= n:
            break
        was_slash = content[i : i + 1] == b"/"
        try:
            obj, i = parse_object(content, i)
        except Exception:
            break
        # a bare keyword (not '/'-prefixed) is an operator; everything
        # else — numbers, strings, arrays, dicts, '/'-names — is an operand
        if was_slash or not isinstance(obj, Name):
            stack.append(obj)
            continue
        op = str(obj)
        if op == "BI":  # inline image: skip the binary blob to its EI
            m = re.compile(rb"\bEI\b").search(content, i)
            i = m.end() if m else n
            stack.clear()
            continue
        if op == "Tf":
            fname = next(
                (str(x) for x in reversed(stack) if isinstance(x, Name)), None
            )
            cur = fonts.get(fname, default) if fname else default
        elif op == "Tj":
            if stack and isinstance(stack[-1], bytes):
                out.append((cur or default).decode(stack[-1]))
        elif op in ("'", '"'):
            s = next((x for x in reversed(stack) if isinstance(x, bytes)), None)
            if s is not None:
                out.append("\n")
                out.append((cur or default).decode(s))
        elif op == "TJ":
            if stack and isinstance(stack[-1], list):
                for el in stack[-1]:
                    if isinstance(el, bytes):
                        out.append((cur or default).decode(el))
                    elif isinstance(el, (int, float)) and el < -150:
                        out.append(" ")
        elif op in ("Td", "TD"):
            ty = stack[-1] if stack and isinstance(stack[-1], (int, float)) else 0
            if ty != 0:
                out.append("\n")
        elif op in ("T*", "Tm", "ET"):
            out.append("\n")
        stack.clear()
    text = "".join(out)
    # collapse intra-line artifacts: trailing hyphen linebreaks, NULs
    text = text.replace("\x00", "")
    text = re.sub(r"-\n(?=[a-z])", "", text)  # de-hyphenate wrapped words
    text = re.sub(r"[ \t]+", " ", text)
    text = re.sub(r"\n{3,}", "\n\n", text)
    return text.strip()


def extract_text(payload: bytes) -> str:
    """PDF bytes → plain text (page order, newline-separated lines).

    Raises ValueError when the payload has no parseable PDF structure at
    all; partial damage degrades to whatever pages/glyphs decode."""
    if not payload.lstrip()[:5].startswith(b"%PDF-"):
        raise ValueError("not a PDF payload (missing %PDF- header)")
    doc = PdfDoc(payload)
    pages = doc.pages()
    if not pages and not doc.objs:
        raise ValueError("no parseable PDF objects")
    parts = []
    for page in pages:
        content = _page_content(doc, page)
        if not content:
            continue
        fonts = _page_fonts(doc, page)
        t = _extract_page_text(content, fonts)
        if t:
            parts.append(t)
    return "\n\n".join(parts)
