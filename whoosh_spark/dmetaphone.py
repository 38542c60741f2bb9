"""Double Metaphone phonetic encoding.

Independent implementation of Lawrence Philips' published Double Metaphone
algorithm (C/C++ Users Journal, June 2000 — public knowledge; the
reference ships its own transcription as src/whoosh/lang/dmetaphone.py
powering analysis.DoubleMetaphoneFilter). Returns (primary, secondary)
codes, secondary None when identical; codes are truncated to 4 chars like
the classic implementation.

The user-visible contract — same-sounding words map to equal codes — is
pinned by behavior-level tests (tests/test_stem_upsert_results.py);
exotic-language edge rules may diverge from the reference's table in rare
cases, which only affects recall on those words, never indexing
correctness (index and query always run the same code).
"""

from __future__ import annotations

_VOWELS = frozenset("AEIOUY")


def _sg(s: str) -> bool:  # Slavo-Germanic hint
    return "W" in s or "K" in s or "CZ" in s or "WITZ" in s


def _ch(s: str, i: int, n: int = 1) -> str:
    """Safe slice s[i:i+n] ('' when out of range)."""
    if i < 0:
        return ""
    return s[i : i + n]


def _any(s: str, i: int, n: int, *opts: str) -> bool:
    return _ch(s, i, n) in opts


def double_metaphone(word: str, maxlen: int = 4) -> tuple[str, str | None]:
    # Keep in-word spaces and pad the tail with spaces exactly like the
    # published C++ (it appends "     " to the input): several rules read
    # a space to mean "word boundary" — 'JOSE '/'SAN J' Spanish handling,
    # 'VAN /VON ' germanic prefixes, 'MAC C' name skips, and CH at
    # end-of-word ('bach' -> PK). Stripping spaces or leaving the tail
    # unpadded silently disables those branches.
    s = "".join(c for c in word.upper() if c.isalpha() or c == " ").strip()
    if not s:
        return "", None
    length = len(s)
    last = length - 1
    s = s + "     "
    pri: list[str] = []
    sec: list[str] = []

    def add(p: str, q: str | None = None) -> None:
        pri.append(p)
        sec.append(p if q is None else q)

    i = 0
    # skip silent leading letters
    if _ch(s, 0, 2) in ("GN", "KN", "PN", "WR", "PS"):
        i = 1
    if _ch(s, 0) == "X":  # initial X -> S (Xavier)
        add("S")
        i = 1

    sg = _sg(s)
    while i < length and (len(pri) < maxlen or len(sec) < maxlen):
        c = s[i]

        if c in _VOWELS:
            if i == 0:
                add("A")
            i += 1
            continue

        if c == "B":
            add("P")
            i += 2 if _ch(s, i + 1) == "B" else 1
            continue

        if c == "\xc7":
            add("S")
            i += 1
            continue

        if c == "C":
            # germanic -MACHER etc
            if (i > 1 and s[i - 2] not in _VOWELS and _ch(s, i - 1, 3) == "ACH"
                    and _ch(s, i + 2) != "I"
                    and (_ch(s, i + 2) != "E" or _ch(s, i - 2, 6) in ("BACHER", "MACHER"))):
                add("K")
                i += 2
                continue
            if _ch(s, i, 6) == "CAESAR":
                add("S")
                i += 2
                continue
            if _ch(s, i, 4) == "CHIA":  # italian chianti
                add("K")
                i += 2
                continue
            if _ch(s, i, 2) == "CH":
                if i > 0 and _ch(s, i, 4) == "CHAE":  # michael
                    add("K", "X")
                    i += 2
                    continue
                if (i == 0
                        and (_any(s, i + 1, 5, "HARAC", "HARIS")
                             or _any(s, i + 1, 3, "HOR", "HYM", "HIA", "HEM"))
                        and _ch(s, 0, 5) != "CHORE"):
                    add("K")  # greek roots: chorus, chemistry
                    i += 2
                    continue
                # germanic/greek 'ch' -> K
                if (_any(s, 0, 4, "VAN ", "VON ") or _ch(s, 0, 3) == "SCH"
                        or _any(s, i - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
                        or _any(s, i + 2, 1, "T", "S")
                        or ((i == 0 or _any(s, i - 1, 1, "A", "O", "U", "E"))
                            and _any(s, i + 2, 1, "L", "R", "N", "M", "B", "H",
                                     "F", "V", "W", " "))):
                    add("K")
                else:
                    if i > 0:
                        if _ch(s, 0, 2) == "MC":
                            add("K")
                        else:
                            add("X", "K")
                    else:
                        add("X")
                i += 2
                continue
            if _ch(s, i, 2) == "CZ" and _ch(s, i - 2, 4) != "WICZ":
                add("S", "X")
                i += 2
                continue
            if _ch(s, i + 1, 3) == "CIA":  # focaccia
                add("X")
                i += 3
                continue
            if _ch(s, i, 2) == "CC" and not (i == 1 and s[0] == "M"):
                if _any(s, i + 2, 1, "I", "E", "H") and _ch(s, i + 2, 2) != "HU":
                    if ((i == 1 and _ch(s, i - 1) == "A")
                            or _any(s, i - 1, 5, "UCCEE", "UCCES")):
                        add("KS")  # accident, succeed
                    else:
                        add("X")  # bacci, bertucci
                    i += 3
                    continue
                add("K")  # pierce's rule
                i += 2
                continue
            if _any(s, i, 2, "CK", "CG", "CQ"):
                add("K")
                i += 2
                continue
            if _any(s, i, 2, "CI", "CE", "CY"):
                if _any(s, i, 3, "CIO", "CIE", "CIA"):
                    add("S", "X")
                else:
                    add("S")
                i += 2
                continue
            add("K")
            if _any(s, i + 1, 2, " C", " Q", " G"):
                i += 3
            elif _any(s, i + 1, 1, "C", "K", "Q") and not _any(s, i + 1, 2, "CE", "CI"):
                i += 2
            else:
                i += 1
            continue

        if c == "D":
            if _ch(s, i, 2) == "DG":
                if _any(s, i + 2, 1, "I", "E", "Y"):
                    add("J")  # edge
                    i += 3
                else:
                    add("TK")  # edgar
                    i += 2
                continue
            add("T")
            i += 2 if _any(s, i, 2, "DT", "DD") else 1
            continue

        if c == "F":
            add("F")
            i += 2 if _ch(s, i + 1) == "F" else 1
            continue

        if c == "G":
            if _ch(s, i + 1) == "H":
                if i > 0 and s[i - 1] not in _VOWELS:
                    add("K")
                    i += 2
                    continue
                if i == 0:
                    if _ch(s, i + 2) == "I":
                        add("J")  # ghislane
                    else:
                        add("K")  # ghost
                    i += 2
                    continue
                # silent gh: hugh, bough, cough/laugh handled below
                if ((i > 1 and _any(s, i - 2, 1, "B", "H", "D"))
                        or (i > 2 and _any(s, i - 3, 1, "B", "H", "D"))
                        or (i > 3 and _any(s, i - 4, 1, "B", "H"))):
                    i += 2
                    continue
                if i > 2 and _ch(s, i - 1) == "U" and _any(s, i - 3, 1, "C", "G", "L", "R", "T"):
                    add("F")  # laugh, cough, rough, tough
                elif i > 0 and _ch(s, i - 1) != "I":
                    add("K")
                i += 2
                continue
            if _ch(s, i + 1) == "N":
                if i == 1 and s[0] in _VOWELS and not sg:
                    add("KN", "N")
                elif _ch(s, i + 2, 2) != "EY" and _ch(s, i + 1) != "Y" and not sg:
                    add("N", "KN")
                else:
                    add("KN")
                i += 2
                continue
            if _ch(s, i + 1, 2) == "LI" and not sg:  # tagliaro
                add("KL", "L")
                i += 2
                continue
            if i == 0 and (_ch(s, i + 1) == "Y"
                           or _any(s, i + 1, 2, "ES", "EP", "EB", "EL", "EY",
                                   "IB", "IL", "IN", "IE", "EI", "ER")):
                add("K", "J")  # ges-, gep- etc
                i += 2
                continue
            if ((_ch(s, i + 1, 2) == "ER" or _ch(s, i + 1) == "Y")
                    and not _any(s, 0, 6, "DANGER", "RANGER", "MANGER")
                    and not _any(s, i - 1, 1, "E", "I")
                    and not _any(s, i - 1, 3, "RGY", "OGY")):
                add("K", "J")
                i += 2
                continue
            if (_any(s, i + 1, 1, "E", "I", "Y") or _any(s, i - 1, 4, "AGGI", "OGGI")):
                if (_any(s, 0, 4, "VAN ", "VON ") or _ch(s, 0, 3) == "SCH"
                        or _ch(s, i + 1, 2) == "ET"):
                    add("K")  # obvious germanic
                elif _ch(s, i + 1, 4) == "IER ":  # french ending (pad makes end-of-word a space)
                    add("J")
                else:
                    add("J", "K")
                i += 2
                continue
            add("K")
            i += 2 if _ch(s, i + 1) == "G" else 1
            continue

        if c == "H":
            # keep h between vowels or after silence-start
            if (i == 0 or s[i - 1] in _VOWELS) and _ch(s, i + 1) in _VOWELS:
                add("H")
                i += 2
            else:
                i += 1
            continue

        if c == "J":
            if _ch(s, i, 4) == "JOSE" or _ch(s, 0, 4) == "SAN ":
                if (i == 0 and _ch(s, i + 4) == " ") or _ch(s, 0, 4) == "SAN ":
                    add("H")
                else:
                    add("J", "H")
                i += 1
                continue
            if i == 0:
                add("J", "A")  # yankelovich / jankelowicz
            elif (s[i - 1] in _VOWELS and not sg
                  and _any(s, i + 1, 1, "A", "O")):
                add("J", "H")
            elif i == last:
                add("J", "")
            elif not _any(s, i + 1, 1, "L", "T", "K", "S", "N", "M", "B", "Z") \
                    and not _any(s, i - 1, 1, "S", "K", "L"):
                add("J")
            i += 2 if _ch(s, i + 1) == "J" else 1
            continue

        if c == "K":
            add("K")
            i += 2 if _ch(s, i + 1) == "K" else 1
            continue

        if c == "L":
            if _ch(s, i + 1) == "L":
                # spanish ll: cabrillo, gallegos
                if ((i == length - 3 and _any(s, i - 1, 4, "ILLO", "ILLA", "ALLE"))
                        or ((_any(s, last - 1, 2, "AS", "OS") or _any(s, last, 1, "A", "O"))
                            and _ch(s, i - 1, 4) == "ALLE")):
                    add("L", "")
                    i += 2
                    continue
                i += 2
            else:
                i += 1
            add("L")
            continue

        if c == "M":
            add("M")
            if ((_ch(s, i - 1, 3) == "UMB" and (i + 1 == last or _ch(s, i + 2, 2) == "ER"))
                    or _ch(s, i + 1) == "M"):
                i += 2
            else:
                i += 1
            continue

        if c == "N":
            add("N")
            i += 2 if _ch(s, i + 1) == "N" else 1
            continue

        if c == "\xd1":
            add("N")
            i += 1
            continue

        if c == "P":
            if _ch(s, i + 1) == "H":
                add("F")
                i += 2
                continue
            add("P")
            i += 2 if _any(s, i + 1, 1, "P", "B") else 1
            continue

        if c == "Q":
            add("K")
            i += 2 if _ch(s, i + 1) == "Q" else 1
            continue

        if c == "R":
            # french rogier: silent final -r in secondary
            if (i == last and not sg and _ch(s, i - 2, 2) == "IE"
                    and not _any(s, i - 4, 2, "ME", "MA")):
                add("", "R")
            else:
                add("R")
            i += 2 if _ch(s, i + 1) == "R" else 1
            continue

        if c == "S":
            if _any(s, i - 1, 3, "ISL", "YSL"):  # island, isle
                i += 1
                continue
            if i == 0 and _ch(s, i, 5) == "SUGAR":
                add("X", "S")
                i += 1
                continue
            if _ch(s, i, 2) == "SH":
                if _any(s, i + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
                    add("S")  # germanic
                else:
                    add("X")
                i += 2
                continue
            if _any(s, i, 3, "SIO", "SIA") or _ch(s, i, 4) == "SIAN":
                add("S" if not sg else "S", "X" if not sg else "S")
                i += 3
                continue
            if (i == 0 and _any(s, i + 1, 1, "M", "N", "L", "W")) or _ch(s, i + 1) == "Z":
                add("S", "X")  # german/slavic smith/schneider
                i += 2 if _ch(s, i + 1) == "Z" else 1
                continue
            if _ch(s, i, 2) == "SC":
                if _ch(s, i + 2) == "H":
                    if _any(s, i + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
                        if _any(s, i + 3, 2, "ER", "EN"):
                            add("X", "SK")  # schermerhorn
                        else:
                            add("SK")  # school, schooner
                    elif i == 0 and _ch(s, 3) not in _VOWELS and _ch(s, 3) != "W":
                        add("X", "S")
                    else:
                        add("X")
                    i += 3
                    continue
                if _any(s, i + 2, 1, "I", "E", "Y"):
                    add("S")
                else:
                    add("SK")
                i += 3
                continue
            if i == last and _any(s, i - 2, 2, "AI", "OI"):
                add("", "S")  # french louis
            else:
                add("S")
            i += 2 if _any(s, i + 1, 1, "S", "Z") else 1
            continue

        if c == "T":
            if _ch(s, i, 4) == "TION" or _any(s, i, 3, "TIA", "TCH"):
                add("X")
                i += 3
                continue
            if _ch(s, i, 2) == "TH" or _ch(s, i, 3) == "TTH":
                if (_any(s, i + 2, 2, "OM", "AM") or _any(s, 0, 4, "VAN ", "VON ")
                        or _ch(s, 0, 3) == "SCH"):
                    add("T")  # thomas, thames
                else:
                    add("0", "T")
                i += 2
                continue
            add("T")
            i += 2 if _any(s, i + 1, 1, "T", "D") else 1
            continue

        if c == "V":
            add("F")
            i += 2 if _ch(s, i + 1) == "V" else 1
            continue

        if c == "W":
            if _ch(s, i, 2) == "WR":
                add("R")
                i += 2
                continue
            if i == 0 and (_ch(s, i + 1) in _VOWELS or _ch(s, i, 2) == "WH"):
                if _ch(s, i + 1) in _VOWELS:
                    add("A", "F")  # wasserman
                else:
                    add("A")  # wharton
            if ((i == last and _ch(s, i - 1) in _VOWELS)
                    or _any(s, i - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY")
                    or _ch(s, 0, 3) == "SCH"):
                add("", "F")
                i += 1
                continue
            if _any(s, i, 4, "WICZ", "WITZ"):
                add("TS", "FX")
                i += 4
                continue
            i += 1
            continue

        if c == "X":
            if not (i == last and (_any(s, i - 3, 3, "IAU", "EAU")
                                   or _any(s, i - 2, 2, "AU", "OU"))):
                add("KS")  # not french
            i += 2 if _any(s, i + 1, 1, "C", "X") else 1
            continue

        if c == "Z":
            if _ch(s, i + 1) == "H":
                add("J")  # chinese zh
                i += 2
                continue
            if (_any(s, i + 1, 2, "ZO", "ZI", "ZA")
                    or (sg and i > 0 and _ch(s, i - 1) != "T")):
                add("S", "TS")
            else:
                add("S")
            i += 2 if _ch(s, i + 1) == "Z" else 1
            continue

        i += 1  # anything else: skip

    p = "".join(pri)[:maxlen]
    q = "".join(sec)[:maxlen]
    return p, (q if q != p else None)


def dmetaphone_codes(word: str) -> list[str]:
    """Both codes as a flat list (DoubleMetaphoneFilter token stream)."""
    p, q = double_metaphone(word)
    out = [p] if p else []
    if q:
        out.append(q)
    return out
