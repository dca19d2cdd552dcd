"""HTML-domain semantic kernel: byte-exact text + link extraction.

Behavioural ports of the reference's single-pass HTML state machine:

- html_to_text       -> Serial Version/src/crawler.c:134-437
- is_useful_content  -> Serial Version/src/crawler.c:110-131
- extract_title      -> Serial Version/src/crawler.c:749-797
- extract_links      -> Serial Version/src/crawler.c:685-746 (href scan)
                        + the stateless parts of process_extracted_url
                        (crawler.c:561-682)

html_to_text operates on BYTES and returns BYTES - the reference fputc's
raw bytes into the dataset file, and the per-row invariant is byte-identical
extracted text. Deliberately preserved quirks:

- `html_len` is the length of the ORIGINAL buffer, measured BEFORE the
  pointer is advanced to `<article`/`<section class="section-inner`/`<body`
  (crawler.c:145 vs 154-176). All `i + k < html_len` lookahead guards use
  this stale length, so near the end of the advanced buffer they pass and the
  (NUL-terminated) strncmp simply fails - Python slices behave identically.
- the medium branch inside the loop keys on "medium.com" occurring in the
  ADVANCED buffer (crawler.c:244), while the article-jump keys on the
  original buffer (crawler.c:156). They can disagree; both are honored.
- `<head>` is matched only as the attribute-less exact tag, so `<head lang=..>`
  content is NOT head-skipped.
- the block-break rule fires on any tag starting `<p>`, `<br`, `<li`, `<h` -
  including `<html>`, `<header>`, `<hr>` (crawler.c:320-323).
- unknown entities are skipped by scanning up to 10 chars for ';'
  (crawler.c:365-372 / 415-422); otherwise the literal '&' byte is emitted.
- whitespace collapses to a single ' ' in flowing text; buffered elements
  (title/heading/paragraph) collapse internal whitespace and cap at 9,999
  bytes (text_buffer[10000], crawler.c:148,343).
- no content emitted -> the literal fallback sentence (crawler.c:434-436).
"""

from __future__ import annotations

import re

from .urls import extract_base_domain, extractor_domain_valid, resolve_url

NO_CONTENT_FALLBACK = b"No readable content could be extracted from this page."

_WS = b" \t\n\v\f\r"  # C isspace set
_TEXT_BUFFER_CAP = 9999  # sizeof(text_buffer) - 1

# fast-path scanner: positions where the per-char state machine can change
# state inside tag/skip modes. Between matches the behavior is a bulk skip
# (proved equivalent by differential fuzz vs the compiled C reference).
# Content modes bulk-scan with bytes.find on '<'/'&' instead.
_ANGLE = re.compile(rb"[<>]")


def _nul_truncate(b: bytes) -> bytes:
    """The C code measures/scans with strlen/strstr - everything past the
    first NUL byte is invisible to it."""
    z = b.find(b"\0")
    return b[:z] if z >= 0 else b


# byte-class table for is_useful_content: alpha -> 'a', C-isspace -> 's',
# everything else -> 'x'; translate+count turns the per-byte Python loop
# into two C-speed passes (it was 36% of extraction time on medium-path
# pages, called once per paragraph)
_USEFUL_CLASS = bytes(
    (ord("a") if (65 <= c <= 90 or 97 <= c <= 122)
     else ord("s") if c in b" \t\n\v\f\r" else ord("x"))
    for c in range(256))
_A = ord("a")
_S = ord("s")

import numpy as _np  # noqa: E402  (float32 quirk reproduction)

from functools import lru_cache as _lru_cache  # noqa: E402


@_lru_cache(maxsize=1 << 16)
def _useful_verdict(alpha: int, space: int, length: int) -> bool:
    """float32-quirk ratio test, memoized: the verdict is a pure function
    of the three small integers, and real corpora repeat (alpha, space,
    length) shapes constantly - np.float32 scalar construction is ~1 us a
    call and was the bulk of is_useful_content's cost (it runs once per
    paragraph on medium-branch pages)."""
    alpha_ratio = _np.float32(alpha) / _np.float32(length)
    space_ratio = _np.float32(space) / _np.float32(length)
    return bool(alpha_ratio > 0.4) and bool(space_ratio > 0.05) \
        and bool(space_ratio < 0.3)


def is_useful_content(text: bytes, length: int) -> bool:
    """crawler.c:110-131. Counts over the first 200 bytes, ratios over the
    FULL length (quirk). ASCII classification (C locale). The ratios are
    SINGLE-precision floats in C ((float)count / length) compared against
    double literals - at exact boundaries like 10/200 the float rounds UP
    past 0.05 and passes; double math would fail. np.float32 reproduces it
    (memoized in _useful_verdict - same inputs, same quirk, same answer).

    Accepts bytes OR bytearray: only the first 200 bytes are sliced and
    classified, so callers holding a (up to 10 KB) paragraph bytearray
    pass it directly instead of copying the whole buffer for the gate.
    """
    if length < 10:
        return False
    head = bytes(text[:min(length, 200)]).translate(_USEFUL_CLASS)
    return _useful_verdict(head.count(_A), head.count(_S), length)


def _decode_entity(h: bytes, i: int, html_len: int) -> tuple[bytes | None, int]:
    """Shared entity logic (crawler.c:345-373 == 394-423). Returns
    (emitted bytes or None to emit nothing, new value of i). `i` points at
    '&'; the caller's loop will still do its own i += 1 afterwards, so the
    returned i mimics the C in-loop `i += k` adjustments. Entity names are
    case-SENSITIVE (strncmp)."""
    # the six known entities are case-sensitive and pairwise distinct in
    # their second byte - one index probe replaces six startswith calls
    n = len(h)
    if i + 1 < n:
        b2 = h[i + 1]
        if b2 == 0x61:  # 'a'
            if h.startswith(b"&amp;", i) and i + 5 < html_len:
                return b"&", i + 4
        elif b2 == 0x6C:  # 'l'
            if h.startswith(b"&lt;", i) and i + 4 < html_len:
                return b"<", i + 3
        elif b2 == 0x67:  # 'g'
            if h.startswith(b"&gt;", i) and i + 4 < html_len:
                return b">", i + 3
        elif b2 == 0x71:  # 'q'
            if h.startswith(b"&quot;", i) and i + 6 < html_len:
                return b'"', i + 5
        elif b2 == 0x6E:  # 'n'
            if h.startswith(b"&nbsp;", i) and i + 6 < html_len:
                return b" ", i + 5
        elif b2 == 0x23:  # '#'
            if h.startswith(b"&#039;", i) and i + 6 < html_len:
                return b"'", i + 5
    # unknown entity: scan ahead up to 10 bytes for ';' (crawler.c:365-372)
    n = len(h)
    j = i
    while j < n and h[j] != 0x3B and j - i < 10:  # ';'
        j += 1
    if j < n and h[j] == 0x3B:
        return None, j  # skip the whole entity
    return h[i : i + 1], i  # emit the literal '&'


def html_to_text(html: bytes) -> bytes:
    """Byte-exact port of crawler.c:134-437. bytes in, bytes out.

    Performance: a per-byte Python state machine runs ~1.3 MB/s; this port
    adds bulk fast paths (regex/find jumps over comment bodies, tag
    interiors, head/script/style content, and plain-text runs) while the
    original per-char logic remains authoritative at every state-changing
    byte. Equivalence is differential-fuzz-proved against the compiled C
    reference (tests/test_kernel_golden.py + /tmp harness, 0 mismatches).
    """
    if html is None:
        html = b""
    html = _nul_truncate(html)  # C strlen/strstr cannot see past NUL
    out = bytearray()
    in_tag = in_script = in_style = in_head = in_comment = False
    consecutive_spaces = 0
    content_written = False
    html_len = len(html)  # measured BEFORE the pointer advance (quirk)

    buf = bytearray()
    in_title = in_heading = in_paragraph = False

    # medium article jump (crawler.c:154-168), keyed on the ORIGINAL buffer
    article_found = False
    if b"medium.com" in html:
        idx = html.find(b"<article")
        if idx < 0:
            idx = html.find(b'<section class="section-inner')
        if idx >= 0:
            html = html[idx:]
            article_found = True
    if not article_found:
        b_idx = html.find(b"<body")
        if b_idx >= 0:
            html = html[b_idx:]

    h = html
    hl = html.lower()  # one-time lowering for strncasecmp-style checks
    n = len(h)
    loop_medium = b"medium.com" in h  # crawler.c:244, constant per document

    def emit(data: bytes) -> None:
        nonlocal content_written
        out.extend(data)
        content_written = True

    i = 0
    while i < n:
        # ---- fast-path dispatch: bulk-skip/copy up to the next byte that
        # can change machine state; the per-char logic below remains
        # authoritative at every such byte.
        if in_comment:
            j = h.find(b"-->", i)
            if j < 0:
                break  # unterminated comment swallows the rest
            i = j
        elif in_head or in_script or in_style or in_tag:
            m = _ANGLE.search(h, i)
            if m is None:
                break  # no further '<'/'>': no state change possible
            i = m.start()
        elif in_title or in_heading or in_paragraph:
            # the only state-changing bytes in buffered content are '<'
            # (tag machinery) and '&' (entity); everything between is the
            # per-byte append+WS-collapse, which split/join reproduces in
            # one pass: each maximal WS run becomes a single ' ' appended
            # iff the buffer tail is a non-space byte (inner runs always
            # follow a word byte; the leading run consults buf's tail).
            blen = len(buf)
            if blen >= _TEXT_BUFFER_CAP:
                # full buffer: every content byte is append-guarded into a
                # no-op - including '&' (the entity decode sits under the
                # same cap guard, so per-char it neither emits nor consumes
                # more than one byte). Jump straight to the next tag byte.
                j = h.find(b"<", i)
                if j < 0:
                    break
                i = j
            else:
                j = h.find(b"<", i)
                if j < 0:
                    j = n
                a = h.find(b"&", i, j)
                stop = a if a >= 0 else j
                if stop > i:
                    seg = h[i:stop]
                    parts = seg.split()
                    if parts:
                        piece = b" ".join(parts)
                        if seg[0] in _WS and blen and buf[-1] not in _WS:
                            piece = b" " + piece
                        if seg[-1] in _WS:
                            piece += b" "
                        room = _TEXT_BUFFER_CAP - blen
                        buf.extend(piece if len(piece) <= room
                                   else piece[:room])
                    elif blen and buf[-1] not in _WS:
                        buf.extend(b" ")  # WS-only segment -> one space
                    i = stop
                    continue
                if i == a:
                    # at '&' with room in the buffer: the per-char path
                    # would cross the whole dispatch ladder just to reach
                    # the same decode - handle it inline (semantics
                    # identical: decode, append when emitted, i += 1)
                    emitted, i = _decode_entity(h, i, html_len)
                    if emitted is not None:
                        buf.extend(emitted)
                    i += 1
                    continue
                # at '<': authoritative per-char logic below
        else:
            # flowing text: same two stop bytes; the collapsed segment goes
            # to the output with consecutive_spaces carrying the boundary
            # state (a leading WS run emits ' ' only when the previous
            # emitted byte was not a collapsed space).
            j = h.find(b"<", i)
            if j < 0:
                j = n
            a = h.find(b"&", i, j)
            stop = a if a >= 0 else j
            if stop > i:
                seg = h[i:stop]
                parts = seg.split()
                if parts:
                    piece = b" ".join(parts)
                    if seg[0] in _WS and consecutive_spaces == 0:
                        piece = b" " + piece
                    if seg[-1] in _WS:
                        piece += b" "
                        consecutive_spaces = 1
                    else:
                        consecutive_spaces = 0
                    out.extend(piece)
                    content_written = True
                elif consecutive_spaces == 0:  # WS-only segment
                    out.extend(b" ")
                    content_written = True
                    consecutive_spaces = 1
                i = stop
                continue
            if i == a:
                # at '&' in flowing text: inline the per-char entity
                # branch (decode, emit when produced, content_written is
                # set even for a swallowed unknown entity - the C marks
                # the character handled either way - then i += 1)
                emitted, i = _decode_entity(h, i, html_len)
                if emitted is not None:
                    out.extend(emitted)
                consecutive_spaces = 0
                content_written = True
                i += 1
                continue
            # at '<': authoritative per-char logic below

        c = h[i]
        # ---- comments (crawler.c:180-192). The "<!--" probe is gated on
        # "<!" (the pattern can match nowhere else), saving a bytes method
        # call at every ordinary '<' that reaches the per-char path.
        if c == 0x3C and i + 3 < html_len and i + 1 < n \
                and h[i + 1] == 0x21 and not in_comment and not in_tag \
                and h.startswith(b"<!--", i):
            in_comment = True
            i += 4
            continue
        if in_comment and i + 2 < html_len and h.startswith(b"-->", i):
            in_comment = False
            i += 3
            continue
        if in_comment:
            i += 1
            continue

        # ---- section tags chain (crawler.c:195-303); every branch's
        # pattern starts with '<', so the whole chain is gated on it, and
        # the SECOND lowered byte dispatches to the only group of patterns
        # that can match there (h/s/t/p//) - the original flat elif chain
        # paid ~8 guard+startswith evaluations per '<'. Grouping preserves
        # the original elif order within each group; across groups the
        # patterns are disjoint in their second byte, so at most one
        # group's branch can fire either way. All pattern lengths are >= 3,
        # so when fewer than 2 bytes remain no branch can match and the
        # dispatch is skipped entirely (startswith would just fail).
        if c != 0x3C or i + 1 >= n:
            pass
        elif (b2 := hl[i + 1]) == 0x68:  # 'h': <head>, medium <h1>/<h2>
            if not in_tag and i + 6 < html_len and hl.startswith(b"<head>", i):
                in_head = True
                in_tag = True
                i += 1
                continue
            elif not in_tag and loop_medium:
                if i + 3 < html_len and hl.startswith(b"<h1", i):
                    in_heading = True
                    buf.clear()
                    in_tag = True
                    i += 3
                    continue
                elif i + 3 < html_len and hl.startswith(b"<h2", i):
                    in_heading = True
                    buf.clear()
                    in_tag = True
                    i += 3
                    continue
        elif b2 == 0x2F:  # '/': the closing tags
            if in_head and i + 7 < html_len and hl.startswith(b"</head>", i):
                in_head = False
                in_tag = True
                i += 7
                continue
            elif in_script and i + 9 < html_len and hl.startswith(b"</script>", i):
                in_script = False
                i += 9
                continue
            elif in_style and i + 8 < html_len and hl.startswith(b"</style>", i):
                in_style = False
                i += 8
                continue
            elif in_title and i + 8 < html_len and hl.startswith(b"</title>", i):
                in_title = False
                i += 8
                if buf:
                    emit(b"\n\n# " + bytes(buf) + b"\n\n")
                buf.clear()
                continue
            elif not in_tag and loop_medium:
                # medium closing tags (crawler.c:243-303)
                if in_heading and i + 5 < html_len and hl.startswith(b"</h1>", i):
                    in_heading = False
                    i += 5
                    if buf:
                        emit(b"\n\n# " + bytes(buf) + b"\n\n")
                    buf.clear()
                    continue
                elif in_heading and i + 5 < html_len and hl.startswith(b"</h2>", i):
                    in_heading = False
                    i += 5
                    if buf:
                        emit(b"\n\n## " + bytes(buf) + b"\n\n")
                    buf.clear()
                    continue
                elif in_paragraph and i + 4 < html_len and hl.startswith(b"</p>", i):
                    in_paragraph = False
                    i += 4
                    if buf:
                        # gate on the bytearray itself (only the first 200
                        # bytes are read): no whole-buffer copy for
                        # REJECTED paragraphs, one copy instead of two for
                        # kept ones
                        if is_useful_content(buf, len(buf)):
                            emit(bytes(buf) + b"\n\n")
                    buf.clear()
                    continue
        elif b2 == 0x73:  # 's': <script / <style (both fall through, as C)
            if not in_tag and i + 8 < html_len and hl.startswith(b"<script", i):
                in_script = True
                in_tag = True
            elif not in_tag and i + 7 < html_len and hl.startswith(b"<style", i):
                in_style = True
                in_tag = True
        elif b2 == 0x74:  # 't': <title>
            if not in_tag and i + 7 < html_len and hl.startswith(b"<title>", i):
                in_title = True
                buf.clear()
                i += 7
                continue
        elif b2 == 0x70:  # 'p': medium <p>
            if not in_tag and loop_medium and i + 3 < html_len \
                    and hl.startswith(b"<p>", i):
                in_paragraph = True
                buf.clear()
                i += 3
                continue

        # ---- head/script/style content skip (crawler.c:306-313)
        if in_head or in_script or in_style:
            if c == 0x3C:  # '<'
                in_tag = True
                # whole-tag shortcut: when the interior holds no further
                # '<', nothing in it can change state before the '>' (the
                # closing-tag probes above all start with '<'), so the two
                # per-char visits collapse into one jump past the '>'
                gt = h.find(b">", i + 1)
                if gt > 0:
                    lt = h.find(b"<", i + 1, gt)
                    if lt < 0:
                        in_tag = False
                        i = gt + 1
                        continue
            elif in_tag and c == 0x3E:  # '>'
                in_tag = False
            i += 1
            continue

        # ---- generic tag open + block breaks (crawler.c:316-331)
        if c == 0x3C:
            in_tag = True
            if i + 4 < html_len and i + 1 < n and hl[i + 1] in b"pbhl" and (
                hl.startswith(b"<p>", i) or hl.startswith(b"<br", i)
                or hl.startswith(b"<li", i) or hl.startswith(b"<h", i)
            ):
                if not in_title and not in_heading and not in_paragraph:
                    out.extend(b"\n\n")  # break without content_written
                consecutive_spaces = 0
            # whole-tag shortcut (see the skip-mode branch): interior free
            # of '<' -> jump straight past the closing '>' in one visit
            gt = h.find(b">", i + 1)
            if gt > 0:
                lt = h.find(b"<", i + 1, gt)
                if lt < 0:
                    in_tag = False
                    i = gt + 1
                    continue
            i += 1
            continue
        if in_tag:
            if c == 0x3E:
                in_tag = False
            i += 1
            continue

        # ---- buffered elements (crawler.c:342-384)
        if in_title or in_heading or in_paragraph:
            if len(buf) < _TEXT_BUFFER_CAP:
                if c == 0x26:  # '&'
                    emitted, i = _decode_entity(h, i, html_len)
                    if emitted is not None:
                        buf.extend(emitted)
                elif c in _WS:
                    if buf and buf[-1] not in _WS:
                        buf.extend(b" ")
                else:
                    buf.append(c)
            i += 1
            continue

        # ---- flowing text (crawler.c:387-430)
        if c in _WS:
            if consecutive_spaces == 0:
                emit(b" ")
                consecutive_spaces = 1
        else:
            if c == 0x26:
                emitted, i = _decode_entity(h, i, html_len)
                if emitted is not None:
                    emit(emitted)
            else:
                emit(h[i : i + 1])
            consecutive_spaces = 0
            content_written = True
        i += 1

    if not content_written:
        # crawler.c:434-436 APPENDS the fallback: block-break "\n\n" bytes
        # (which don't set content_written) may already precede it.
        out.extend(NO_CONTENT_FALLBACK)
    return bytes(out)


def extract_title(html: bytes) -> bytes:
    """crawler.c:749-797: substring between the first `<title...>` and
    `</title>`, <=255 bytes, with in-place &amp;/&lt;/&gt; decoding."""
    html = _nul_truncate(html)
    start = html.find(b"<title")
    if start < 0:
        return b""
    gt = html.find(b">", start)
    if gt < 0:
        return b""
    end = html.find(b"</title>", gt + 1)
    if end < 0:
        return b""
    title = html[gt + 1 : end]
    if not (0 < len(title) < 255):
        return b""
    for ent, ch in ((b"&amp;", b"&"), (b"&lt;", b"<"), (b"&gt;", b">")):
        title = title.replace(ent, ch)
    return title


def derive_medium_filename(url: str, html: bytes) -> str:
    """S4 (medium variant): get_medium_filename (Serial Version/src/
    crawler.c:800-845). Title slug -> medium_<slug>.txt; else profile
    username -> medium_profile_<user>.txt; else the url-hash fallback.
    The slug keeps [a-zA-Z0-9 _-] bytes (C isalnum, so ASCII only),
    space->'_', lowercased, capped at 251 output bytes."""
    from .urls import derive_filename

    title = extract_title(html)
    if title:
        out = bytearray()
        for c in title:
            if len(out) >= 251:
                break
            ch = chr(c)
            if ch.isascii() and (ch.isalnum() or ch in " -_"):
                out.append(ord("_") if ch == " " else ord(ch.lower()))
        if out:
            # snprintf(filename, 256, "medium_%s.txt", slug): a 245+ char
            # slug overflows the 256-byte buffer and snprintf TRUNCATES to
            # 255 chars, eating into/past the ".txt" suffix (crawler.c:821)
            return f"medium_{out.decode('ascii')}.txt"[:255]
    if "medium.com/@" in url:
        # the C copies username BYTES until '/', '?' or the 99-byte cap
        # (crawler.c:830-834)
        ub = url.encode("utf-8")
        user = ub[ub.find(b"@") + 1:]
        for i, c in enumerate(user):
            if c in (0x2F, 0x3F) or i >= 99:
                user = user[:i]
                break
        if user:
            return f"medium_profile_{user.decode('utf-8', 'replace')}.txt"
    return derive_filename(url)


def iter_href_candidates(html: bytes):
    """Document-order href scan (extract_links loop, crawler.c:694-745).

    Yields raw candidate bytes between href="..." / href='...' quotes. The
    scan is byte-exact: earliest of the two quote styles wins; a missing end
    quote advances one byte past the opening quote and rescans.
    """
    html = _nul_truncate(html)
    ptr = 0
    n = len(html)
    while ptr < n:
        d = html.find(b'href="', ptr)
        s = html.find(b"href='", ptr)
        if d < 0 and s < 0:
            break
        if d >= 0 and (s < 0 or d < s):
            start = d + 6
            end = html.find(b'"', start)
        else:
            start = s + 6
            end = html.find(b"'", start)
        if end >= 0:
            yield html[start:end]
            ptr = end + 1
        else:
            ptr = start + 1  # crawler.c:711 - no end quote, move forward


def extract_links(html: bytes, base_url: str, max_urls: int = 1000) -> list[str]:
    """Stateless page-level link extraction: the candidate scan + resolution
    + in-extractor domain check + first-occurrence self-dedup + page cap
    (crawler.c:685-746 with process_extracted_url minus the visited-set
    check, which is the distributed anti-join's job downstream).

    Returns canonical URLs in extraction order. Note yields INCLUDE URLs the
    serial crawler would drop as already-visited; callers replicate that with
    first-occurrence-wins arbitration over (page seq, link index).
    """
    base_domain = extract_base_domain(base_url)
    if not base_domain:
        return []
    urls: list[str] = []
    seen_in_list: set[str] = set()
    for raw in iter_href_candidates(html):
        if len(urls) >= max_urls:
            break
        try:
            raw_s = raw.decode("utf-8")
        except UnicodeDecodeError:
            raw_s = raw.decode("utf-8", errors="replace")
        canon = resolve_url(raw_s, base_url, base_domain)
        if canon is None:
            continue
        if canon in seen_in_list:
            continue
        if extractor_domain_valid(canon, base_url, base_domain):
            urls.append(canon)
            seen_in_list.add(canon)
    return urls
