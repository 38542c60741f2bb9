"""Language processing: the Porter stemming algorithm.

Reference surface: src/whoosh/lang/porter.py::stem (~L20) powering
analysis/morph.py::StemFilter and the StemmingAnalyzer preset. This is an
independent implementation of the published Porter (1980) algorithm — the
reference mount is empty (SURVEY "Provenance"), so parity is pinned by the
algorithm's canonical test vectors rather than a byte-diff against the
fork.

The filter applies the stem per UNIQUE term in a batch (dict memo), the
same trick as the reference's lru_cache(50000) on StemFilter — token
streams are zipfian, so the per-batch unique vocabulary is tiny relative
to the token count.
"""

from __future__ import annotations

_VOWELS = set("aeiou")


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem_: str) -> int:
    """Number of VC sequences."""
    m = 0
    prev_vowel = False
    for i in range(len(stem_)):
        cons = _is_cons(stem_, i)
        if cons and prev_vowel:
            m += 1
        prev_vowel = not cons
    return m


def _has_vowel(stem_: str) -> bool:
    return any(not _is_cons(stem_, i) for i in range(len(stem_)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    if not (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
    ):
        return False
    return word[-1] not in "wxy"


def stem(word: str) -> str:
    """Porter-stem one lowercase word."""
    if len(word) <= 2:
        return word
    w = word

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    flag = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    step2 = [
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
        ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
        ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
        ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
        ("iviti", "ive"), ("biliti", "ble"),
    ]
    for suf, rep in step2:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 3
    step3 = [
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ]
    for suf, rep in step3:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 4
    step4 = [
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ]
    # at most ONE step-4 rule applies (canonical Porter; the reference's
    # porter.py step4 / step4_2 regexes are mutually exclusive): the 'ion'
    # s/t-condition rule lives in the for/else so it only fires when no
    # listed suffix matched — e.g. 'professional' -> 'profession', never
    # the double reduction 'profession' -> 'profess'.
    for suf in sorted(step4, key=len, reverse=True):
        if w.endswith(suf):
            base = w[: -len(suf)]
            if _measure(base) > 1:
                w = base
            break
    else:
        if w.endswith("ion") and len(w) > 3 and w[-4] in "st" and _measure(w[:-3]) > 1:
            w = w[:-3]

    # step 5a
    if w.endswith("e"):
        base = w[:-1]
        m = _measure(base)
        if m > 1 or (m == 1 and not _cvc(base)):
            w = base
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


def stem_many(terms, memo: dict | None = None):
    """Stem an iterable of terms with memoization (unique-term trick)."""
    memo = memo if memo is not None else {}
    out = []
    for t in terms:
        s = memo.get(t)
        if s is None:
            s = stem(t)
            memo[t] = s
        out.append(s)
    return out


# ------------------------------------------------------------------ Porter2
# The English (Porter2) Snowball stemmer — an independent implementation
# of the published algorithm (snowballstem.org "The English (Porter2)
# stemming algorithm", M.F. Porter 2002). Reference surface:
# src/whoosh/lang/porter2.py::stem, selected by
# lang.stemmer_for_language("en") and therefore by
# analysis/analyzers.py::LanguageAnalyzer("en") — where the classic
# Porter (above) backs StemmingAnalyzer / "en_porter". The two differ on
# real forms (fairly -> fair vs fairli, skies -> sky vs ski), so
# LanguageAnalyzer parity needs this one. Validated on attested
# input/output pairs (tests/test_analysis.py) — the official sample
# vocabulary is not available offline, so vectors are the widely-quoted
# subset, stated as such.

_V2 = set("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_VALID_LI = set("cdeghkmnrt")

_P2_EXCEPTIONS = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_P2_EXCEPTIONS_1A = frozenset(
    ("inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed"))


def _p2_regions(word: str) -> tuple[int, int]:
    """(r1, r2) start offsets per the spec, with the gener-/commun-/
    arsen- R1 exception."""
    n = len(word)
    for pre in ("gener", "commun", "arsen"):
        if word.startswith(pre):
            r1 = len(pre)
            break
    else:
        r1 = n
        for i in range(1, n):
            if word[i] not in _V2 and word[i - 1] in _V2:
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in _V2 and word[i - 1] in _V2:
            r2 = i + 1
            break
    return r1, r2


def _p2_is_short_syllable(word: str, i: int) -> bool:
    """Short syllable at index i (a vowel): either a non-initial vowel
    followed by a non-vowel other than w/x/Y and preceded by a
    non-vowel, or an initial vowel followed by a non-vowel."""
    c = word[i]
    if c not in _V2 or c == "Y":
        return False
    if i == 0:
        return len(word) >= 2 and word[1] not in _V2
    return (
        i + 1 < len(word)
        and word[i + 1] not in _V2
        and word[i + 1] not in "wxY"
        and word[i - 1] not in _V2
    )


def _p2_is_short(word: str, r1: int) -> bool:
    return r1 >= len(word) and len(word) >= 2 and \
        _p2_is_short_syllable(word, len(word) - 2)


def _p2_has_vowel(s: str) -> bool:
    return any(c in _V2 for c in s)


def stem2(word: str) -> str:
    """English (Porter2) Snowball stem of an already-lowercased word."""
    if len(word) <= 2:
        return word
    # step 0: apostrophe trimming (defensive — the default tokenizer
    # never emits apostrophes)
    if word.startswith("'"):
        word = word[1:]
    if word.endswith("'s'"):
        word = word[:-3]
    elif word.endswith("'s"):
        word = word[:-2]
    elif word.endswith("'"):
        word = word[:-1]
    if len(word) <= 2:
        return word
    exc = _P2_EXCEPTIONS.get(word)
    if exc is not None:
        return exc
    # mark consonant-y as Y
    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _V2:
            chars[i] = "Y"
    word = "".join(chars)
    r1, r2 = _p2_regions(word)

    # ---- step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ied") or word.endswith("ies"):
        word = word[:-2] if len(word) > 4 else word[:-1]
    elif word.endswith("ss") or word.endswith("us"):
        pass
    elif word.endswith("s"):
        # delete if the preceding part has a vowel NOT immediately
        # before the s
        if _p2_has_vowel(word[:-2]):
            word = word[:-1]
    if word in _P2_EXCEPTIONS_1A:
        return word.lower()

    # ---- step 1b
    if word.endswith("eedly"):
        if len(word) - 5 >= r1:
            word = word[:-3]
    elif word.endswith("eed"):
        if len(word) - 3 >= r1:
            word = word[:-1]
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem_part = word[: -len(suf)]
                if _p2_has_vowel(stem_part):
                    word = stem_part
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif _p2_is_short(word, r1):
                        word += "e"
                break

    # ---- step 1c: y/Y -> i after a non-vowel that is not word-initial
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in _V2
    ):
        word = word[:-1] + "i"

    # ---- step 2 (longest suffix, condition: in R1)
    _STEP2 = (
        ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
        ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
        ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
        ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
        ("bli", "ble"),
    )
    for suf, repl in _STEP2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + repl
            break
    else:
        if word.endswith("ogi"):
            if len(word) - 3 >= r1 and len(word) >= 4 and word[-4] == "l":
                word = word[:-1]
        elif word.endswith("li"):
            if len(word) - 2 >= r1 and word[-3] in _VALID_LI:
                word = word[:-2]

    # ---- step 3 (in R1; ative additionally needs R2)
    _STEP3 = (
        ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
        ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
        ("ful", ""), ("ness", ""),
    )
    if word.endswith("ative"):
        if len(word) - 5 >= r1 and len(word) - 5 >= r2:
            word = word[:-5]
    else:
        for suf, repl in _STEP3:
            if word.endswith(suf):
                if len(word) - len(suf) >= r1:
                    word = word[: -len(suf)] + repl
                break

    # ---- step 4 (in R2)
    _STEP4 = ("ement", "ance", "ence", "able", "ible", "ment",
              "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
              "al", "er", "ic")
    for suf in _STEP4:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                word = word[: -len(suf)]
            break
    else:
        if word.endswith("ion"):
            if len(word) - 3 >= r2 and len(word) >= 4 and word[-4] in "st":
                word = word[:-3]

    # ---- step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2:
            word = word[:-1]
        elif len(word) - 1 >= r1 and not (
            len(word) >= 3 and _p2_is_short_syllable(word, len(word) - 3)
        ):
            word = word[:-1]
    elif word.endswith("l"):
        if len(word) - 1 >= r2 and len(word) >= 2 and word[-2] == "l":
            word = word[:-1]

    return word.lower()


# The published Snowball English stopword list (snowballstem.org
# english/stop.txt) — the data LanguageAnalyzer("en")'s StopFilter uses,
# a superset of the default STOP_WORDS above. The contraction entries
# (i'm, don't, ...) are kept verbatim for data parity even though the
# default \\w+ tokenizer never emits apostrophized tokens — they are
# inert there, exactly as in the reference.
SNOWBALL_STOP_EN = frozenset("""
i me my myself we our ours ourselves you your yours yourself yourselves
he him his himself she her hers herself it its itself they them their
theirs themselves what which who whom this that these those am is are
was were be been being have has had having do does did doing would
should could ought i'm you're he's she's it's we're they're i've you've
we've they've i'd you'd he'd she'd we'd they'd i'll you'll he'll she'll
we'll they'll isn't aren't wasn't weren't hasn't haven't hadn't doesn't
don't didn't won't wouldn't shan't shouldn't can't cannot couldn't
mustn't let's that's who's what's here's there's when's where's why's
how's a an the and but if or because as until while of at by for with
about against between into through during before after above below to
from up down in out on off over under again further then once here
there when where why how all any both each few more most other some
such no nor not only own same so than too very
""".split())


# ---------------------------------------------------------------- German
# Snowball German stemmer (Porter/snowballstem.org "german" algorithm) —
# the stemmer LanguageAnalyzer("de") selects in the reference via
# lang.stemmer_for_language (reference data: src/whoosh/lang/snowball/
# german.py + lang/stopwords.py 'de'). Independent implementation from the
# PUBLISHED algorithm description (the reference mount is empty — SURVEY
# "Provenance"); parity is pinned by hand-executed vectors from the spec
# in tests/test_lang_de.py.

_DE_VOWELS = set("aeiouyäöü")
_DE_S_ENDING = set("bdfghklmnrt")
_DE_ST_ENDING = set("bdfghklmnt")


def _de_prelude(word: str) -> str:
    """ß -> ss; u/y between vowels marked upper-case (= consonant for the
    region scan), left-to-right over the mutating string as in the
    published prelude."""
    word = word.replace("ß", "ss")
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if (
            chars[i] in ("u", "y")
            and chars[i - 1] in _DE_VOWELS
            and chars[i + 1] in _DE_VOWELS
        ):
            chars[i] = chars[i].upper()
    return "".join(chars)


def _de_regions(word: str) -> tuple[int, int]:
    """Standard R1/R2 over the marked string; R2 scans from the UNADJUSTED
    R1, then R1 is floored at 3 (the published mark_regions order:
    setmark p2 happens before the $p1 = x adjustment)."""

    def scan(start: int) -> int:
        for i in range(start, len(word) - 1):
            if word[i] in _DE_VOWELS and word[i + 1] not in _DE_VOWELS:
                return i + 2
        return len(word)

    r1 = scan(0)
    r2 = scan(r1)
    return max(r1, 3), r2


def _de_longest(word: str, sufs: tuple[str, ...]) -> str | None:
    """Snowball 'among' semantics: the LONGEST matching suffix wins; if
    its side-condition then fails, NOTHING is removed (no backtracking to
    a shorter suffix)."""
    best = ""
    for s in sufs:
        if word.endswith(s) and len(s) > len(best):
            best = s
    return best or None


def stem_de(word: str) -> str:
    """Snowball-German-stem one lowercase word."""
    word = _de_prelude(word.lower())
    r1, r2 = _de_regions(word)

    # ---- step 1: (a) em ern er  (b) e en es [+niss]  (c) s (s-ending)
    suf = _de_longest(word, ("em", "ern", "er", "e", "en", "es", "s"))
    if suf is not None and len(word) - len(suf) >= r1:
        if suf == "s":
            if len(word) >= 2 and word[-2] in _DE_S_ENDING:
                word = word[:-1]
        elif suf in ("e", "en", "es"):
            word = word[: -len(suf)]
            if word.endswith("niss"):
                word = word[:-1]
        else:
            word = word[: -len(suf)]

    # ---- step 2: (a) en er est  (b) st (valid st-ending, >=3 before it)
    suf = _de_longest(word, ("en", "er", "est", "st"))
    if suf is not None and len(word) - len(suf) >= r1:
        if suf == "st":
            if len(word) >= 6 and word[-3] in _DE_ST_ENDING:
                word = word[:-2]
        else:
            word = word[: -len(suf)]

    # ---- step 3: d-suffixes
    suf = _de_longest(
        word, ("end", "ung", "ig", "ik", "isch", "lich", "heit", "keit")
    )
    if suf is not None:
        pos = len(word) - len(suf)
        if suf in ("end", "ung"):
            if pos >= r2:
                word = word[:pos]
                if (
                    word.endswith("ig")
                    and len(word) - 2 >= r2
                    and (len(word) < 3 or word[-3] != "e")
                ):
                    word = word[:-2]
        elif suf in ("ig", "ik", "isch"):
            if pos >= r2 and (pos == 0 or word[pos - 1] != "e"):
                word = word[:pos]
        elif suf in ("lich", "heit"):
            if pos >= r2:
                word = word[:pos]
                for pre in ("er", "en"):
                    if word.endswith(pre) and len(word) - 2 >= r1:
                        word = word[:-2]
                        break
        else:  # keit
            if pos >= r2:
                word = word[:pos]
                for pre in ("lich", "ig"):
                    if word.endswith(pre) and len(word) - len(pre) >= r2:
                        word = word[: -len(pre)]
                        break

    # ---- postlude: unmark U/Y, strip umlauts
    return (
        word.lower()
        .replace("ä", "a")
        .replace("ö", "o")
        .replace("ü", "u")
    )


# The published Snowball German stopword list (snowballstem.org
# german/stop.txt) — the data LanguageAnalyzer("de")'s StopFilter uses.
# 'daß' is kept in the pre-reform spelling exactly as published (the
# default \\w+ tokenizer lowercases but never rewrites ß).
SNOWBALL_STOP_DE = frozenset("""
aber alle allem allen aller alles als also am an ander andere anderem
anderen anderer anderes anderm andern anderr anders auch auf aus bei bin
bis bist da damit dann der den des dem die das daß derselbe derselben
denselben desselben demselben dieselbe dieselben dasselbe dazu dein
deine deinem deinen deiner deines denn deren derer dessen dich dir du
dies diese diesem diesen dieser dieses doch dort durch ein eine einem
einen einer eines einig einige einigem einigen einiger einiges einmal
er ihn ihm es etwas euer eure eurem euren eurer eures für gegen gewesen
hab habe haben hat hatte hatten hier hin hinter ich mich mir ihr ihre
ihrem ihren ihrer ihres euch im in indem ins ist jede jedem jeden jeder
jedes jene jenem jenen jener jenes jetzt kann kein keine keinem keinen
keiner keines können könnte machen man manche manchem manchen mancher
manches mein meine meinem meinen meiner meines mit muss musste nach
nicht nichts noch nun nur ob oder ohne sehr sein seine seinem seinen
seiner seines selbst sich sie ihnen sind so solche solchem solchen
solcher solches soll sollte sondern sonst über um und uns unsere
unserem unseren unser unseres unter viel vom von vor während war waren
warst was weg weil weiter welche welchem welchen welcher welches wenn
werde werden wie wieder will wir wird wirst wo wollen wollte würde
würden zu zum zur zwar zwischen
""".split())


# --------------------------------------------------------------- Spanish
# Snowball Spanish stemmer (snowballstem.org "spanish" algorithm) — the
# stemmer LanguageAnalyzer("es") selects in the reference via
# lang.stemmer_for_language (reference data: src/whoosh/lang/snowball/
# spanish.py + lang/stopwords.py 'es'). Independent implementation from
# the PUBLISHED algorithm description (the reference mount is empty —
# SURVEY "Provenance"); parity is pinned by hand-executed vectors from
# the spec in tests/test_lang_es.py.

_ES_VOWELS = set("aeiouáéíóúü")

# step 0: attached pronouns, longest-match
_ES_PRONOUNS = (
    "me", "se", "sela", "selo", "selas", "selos",
    "la", "le", "lo", "las", "les", "los", "nos",
)
# step 0 preceding groups: (a) accented forms -> pronoun dropped AND the
# accent removed; (b) unaccented forms -> pronoun dropped
_ES_PRE_A = ("iéndo", "ándo", "ár", "ér", "ír")
_ES_PRE_B = ("ando", "iendo", "ar", "er", "ir")

# step 1 suffix groups (see stem_es for actions)
_ES_S1_DELETE_R2 = (
    "anza", "anzas", "ico", "ica", "icos", "icas", "ismo", "ismos",
    "able", "ables", "ible", "ibles", "ista", "istas", "oso", "osa",
    "osos", "osas", "amiento", "amientos", "imiento", "imientos",
)
_ES_S1_ADOR = (
    "adora", "ador", "ación", "adoras", "adores", "aciones",
    "ante", "antes", "ancia", "ancias",
)
_ES_S1_ALL = (
    _ES_S1_DELETE_R2 + _ES_S1_ADOR
    + ("logía", "logías", "ución", "uciones", "encia", "encias",
       "amente", "mente", "idad", "idades", "iva", "ivo", "ivas", "ivos")
)

_ES_S2A = (
    "ya", "ye", "yan", "yen", "yeron", "yendo", "yo", "yó",
    "yas", "yes", "yais", "yamos",
)
_ES_S2B_GU = ("en", "es", "éis", "emos")
_ES_S2B = _ES_S2B_GU + (
    "arían", "arías", "arán", "arás", "aríais", "aría", "aréis",
    "aríamos", "aremos", "ará", "aré",
    "erían", "erías", "erán", "erás", "eríais", "ería", "eréis",
    "eríamos", "eremos", "erá", "eré",
    "irían", "irías", "irán", "irás", "iríais", "iría", "iréis",
    "iríamos", "iremos", "irá", "iré",
    "aba", "ada", "ida", "ía", "ara", "iera", "ad", "ed", "id",
    "ase", "iese", "aste", "iste", "an", "aban", "ían", "aran",
    "ieran", "asen", "iesen", "aron", "ieron", "ado", "ido", "ando",
    "iendo", "ió", "ar", "er", "ir", "as", "abas", "adas", "idas",
    "ías", "aras", "ieras", "ases", "ieses", "ís", "áis", "abais",
    "íais", "arais", "ierais", "aseis", "ieseis", "asteis", "isteis",
    "ados", "idos", "amos", "ábamos", "íamos", "imos", "áramos",
    "iéramos", "iésemos", "ásemos",
)
_ES_S3 = ("os", "a", "o", "á", "í", "ó", "e", "é")

_ES_DEACCENT = str.maketrans("áéíóú", "aeiou")


def _es_regions(word: str) -> tuple[int, int, int]:
    """(r1, r2, rv) start offsets per the published definitions: standard
    R1/R2; RV = after the next vowel when letter 2 is a consonant, after
    the next consonant when letters 1-2 are both vowels, else after the
    third letter; end of word when shorter than 3."""

    def scan(start: int) -> int:
        for i in range(start, len(word) - 1):
            if word[i] in _ES_VOWELS and word[i + 1] not in _ES_VOWELS:
                return i + 2
        return len(word)

    r1 = scan(0)
    r2 = scan(r1)
    n = len(word)
    if n < 3:
        rv = n
    elif word[1] not in _ES_VOWELS:
        rv = n
        for i in range(2, n):
            if word[i] in _ES_VOWELS:
                rv = i + 1
                break
    elif word[0] in _ES_VOWELS and word[1] in _ES_VOWELS:
        rv = n
        for i in range(2, n):
            if word[i] not in _ES_VOWELS:
                rv = i + 1
                break
    else:
        rv = 3
    return r1, r2, rv


def _es_longest(word: str, sufs: tuple[str, ...]) -> str | None:
    """Snowball 'among' semantics (same discipline as _de_longest): the
    LONGEST matching suffix wins; a failed side-condition removes nothing
    (no backtracking to a shorter suffix)."""
    best = ""
    for s in sufs:
        if word.endswith(s) and len(s) > len(best):
            best = s
    return best or None



def _limited_longest(word: str, start: int, sufs: tuple[str, ...]) -> str | None:
    """Longest suffix among ``sufs`` lying WHOLLY inside ``word[start:]`` —
    the snowball ``setlimit tomark pV for ([substring] among(...))`` search
    semantics the verb tiers use: a literal longer than the region never
    matches, so it cannot shadow a shorter in-region one (unlike the
    match-then-check discipline of the un-limited standard-suffix amongs)."""
    lim = len(word) - start
    best = ""
    for s in sufs:
        if len(s) <= lim and len(s) > len(best) and word.endswith(s):
            best = s
    return best or None


def stem_es(word: str) -> str:
    """Snowball-Spanish-stem one lowercase word."""
    word = word.lower()
    r1, r2, rv = _es_regions(word)

    # ---- step 0: attached pronoun (only after a gerund/infinitive form
    # that itself sits in RV; accented forms lose their accent)
    pro = _es_longest(word, _ES_PRONOUNS)
    if pro is not None:
        base = word[: -len(pro)]
        for pre in _ES_PRE_A:
            if base.endswith(pre) and len(base) - len(pre) >= rv:
                word = base[: -len(pre)] + pre.translate(_ES_DEACCENT)
                break
        else:
            for pre in _ES_PRE_B:
                if base.endswith(pre) and len(base) - len(pre) >= rv:
                    word = base
                    break
            else:
                if (
                    base.endswith("yendo")
                    and len(base) >= 6
                    and base[-6] == "u"
                    and len(base) - 5 >= rv
                ):
                    word = base

    changed = False

    # ---- step 1: standard suffix removal (longest across ALL groups;
    # the group the winner belongs to decides the action)
    suf = _es_longest(word, _ES_S1_ALL)
    if suf is not None:
        pos = len(word) - len(suf)
        if suf in _ES_S1_DELETE_R2:
            if pos >= r2:
                word = word[:pos]
                changed = True
        elif suf in _ES_S1_ADOR:
            if pos >= r2:
                word = word[:pos]
                changed = True
                if word.endswith("ic") and len(word) - 2 >= r2:
                    word = word[:-2]
        elif suf in ("logía", "logías"):
            if pos >= r2:
                word = word[:pos] + "log"
                changed = True
        elif suf in ("ución", "uciones"):
            if pos >= r2:
                word = word[:pos] + "u"
                changed = True
        elif suf in ("encia", "encias"):
            if pos >= r2:
                word = word[:pos] + "ente"
                changed = True
        elif suf == "amente":
            if pos >= r1:
                word = word[:pos]
                changed = True
                if word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("at") and len(word) - 2 >= r2:
                        word = word[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if word.endswith(pre) and len(word) - 2 >= r2:
                            word = word[:-2]
                            break
        elif suf == "mente":
            if pos >= r2:
                word = word[:pos]
                changed = True
                for pre in ("ante", "able", "ible"):
                    if word.endswith(pre) and len(word) - 4 >= r2:
                        word = word[:-4]
                        break
        elif suf in ("idad", "idades"):
            if pos >= r2:
                word = word[:pos]
                changed = True
                for pre in ("abil", "ic", "iv"):
                    if word.endswith(pre) and len(word) - len(pre) >= r2:
                        word = word[: -len(pre)]
                        break
        else:  # iva ivo ivas ivos
            if pos >= r2:
                word = word[:pos]
                changed = True
                if word.endswith("at") and len(word) - 2 >= r2:
                    word = word[:-2]

    # ---- step 2a (only when step 1 removed nothing): y-verb suffixes
    # preceded by u
    if not changed:
        suf = _limited_longest(word, rv, _ES_S2A)
        did_2a = False
        if suf is not None:
            pos = len(word) - len(suf)
            if pos >= rv and pos >= 1 and word[pos - 1] == "u":
                word = word[:pos]
                did_2a = True
        # ---- step 2b (when 2a removed nothing): other verb suffixes
        if not did_2a:
            suf = _limited_longest(word, rv, _ES_S2B)
            if suf is not None:
                pos = len(word) - len(suf)
                if pos >= rv:
                    word = word[:pos]
                    if suf in _ES_S2B_GU and word.endswith("gu"):
                        # the u deletes regardless of RV, per the spec
                        word = word[:-1]

    # ---- step 3: residual suffix
    suf = _es_longest(word, _ES_S3)
    if suf is not None:
        pos = len(word) - len(suf)
        if suf in ("e", "é"):
            if pos >= rv:
                word = word[:pos]
                if (
                    word.endswith("gu")
                    and len(word) - 1 >= rv
                ):
                    word = word[:-1]
        else:
            if pos >= rv:
                word = word[:pos]

    # ---- postlude: strip acute accents
    return word.translate(_ES_DEACCENT)


# The published Snowball Spanish stopword list (snowballstem.org
# spanish/stop.txt) — the data LanguageAnalyzer("es")'s StopFilter uses;
# it famously carries the full estar/haber/ser/tener conjugation tables.
SNOWBALL_STOP_ES = frozenset("""
de la que el en y a los del se las por un para con no una su al lo como
más pero sus le ya o este sí porque esta entre cuando muy sin sobre
también me hasta hay donde quien desde todo nos durante todos uno les
ni contra otros ese eso ante ellos e esto mí antes algunos qué unos yo
otro otras otra él tanto esa estos mucho quienes nada muchos cual poco
ella estar estas algunas algo nosotros mi mis tú te ti tu tus ellas
nosotras vosotros vosotras os mío mía míos mías tuyo tuya tuyos tuyas
suyo suya suyos suyas nuestro nuestra nuestros nuestras vuestro vuestra
vuestros vuestras esos esas estoy estás está estamos estáis están esté
estés estemos estéis estén estaré estarás estará estaremos estaréis
estarán estaría estarías estaríamos estaríais estarían estaba estabas
estábamos estabais estaban estuve estuviste estuvo estuvimos
estuvisteis estuvieron estuviera estuvieras estuviéramos estuvierais
estuvieran estuviese estuvieses estuviésemos estuvieseis estuviesen
estando estado estada estados estadas estad he has ha hemos habéis han
haya hayas hayamos hayáis hayan habré habrás habrá habremos habréis
habrán habría habrías habríamos habríais habrían había habías habíamos
habíais habían hube hubiste hubo hubimos hubisteis hubieron hubiera
hubieras hubiéramos hubierais hubieran hubiese hubieses hubiésemos
hubieseis hubiesen habiendo habido habida habidos habidas soy eres es
somos sois son sea seas seamos seáis sean seré serás será seremos
seréis serán sería serías seríamos seríais serían era eras éramos erais
eran fui fuiste fue fuimos fuisteis fueron fuera fueras fuéramos
fuerais fueran fuese fueses fuésemos fueseis fuesen siendo sido tengo
tienes tiene tenemos tenéis tienen tenga tengas tengamos tengáis tengan
tendré tendrás tendrá tendremos tendréis tendrán tendría tendrías
tendríamos tendríais tendrían tenía tenías teníamos teníais tenían tuve
tuviste tuvo tuvimos tuvisteis tuvieron tuviera tuvieras tuviéramos
tuvierais tuvieran tuviese tuvieses tuviésemos tuvieseis tuviesen
teniendo tenido tenida tenidos tenidas tened
""".split())


# ---------------------------------------------------------------- French
# Snowball French stemmer (snowballstem.org "french" algorithm) — the
# stemmer LanguageAnalyzer("fr") selects in the reference via
# lang.stemmer_for_language (reference data: src/whoosh/lang/snowball/
# french.py + lang/stopwords.py 'fr'). Independent implementation from
# the PUBLISHED algorithm description (the reference mount is empty —
# SURVEY "Provenance"); parity is pinned by hand-executed vectors from
# the spec in tests/test_lang_fr.py.

_FR_VOWELS = set("aeiouyâàëéêèïîôûù")

# step 1 groups (see stem_fr for actions)
_FR_S1_DELETE_R2 = (
    "ance", "iqUe", "isme", "able", "iste", "eux",
    "ances", "iqUes", "ismes", "ables", "istes",
)
_FR_S1_ATEUR = (
    "atrice", "ateur", "ation", "atrices", "ateurs", "ations",
)
_FR_S1_ALL = _FR_S1_DELETE_R2 + _FR_S1_ATEUR + (
    "logie", "logies", "usion", "ution", "usions", "utions",
    "ence", "ences", "ement", "ements", "ité", "ités",
    "if", "ive", "ifs", "ives", "eaux", "aux", "euse", "euses",
    "issement", "issements", "amment", "emment", "ment", "ments",
)

# step 2a: i-verb suffixes (the marked forms arise from the prelude:
# 'iraient' -> 'iraIent' etc.)
_FR_S2A = (
    "îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira", "irai",
    "iraIent", "irais", "irait", "iras", "irent", "irez", "iriez",
    "irions", "irons", "iront", "is", "issaIent", "issais", "issait",
    "issant", "issante", "issantes", "issants", "isse", "issent",
    "isses", "issez", "issiez", "issions", "issons", "it",
)

# step 2b: other verb suffixes, in their three action groups
_FR_S2B_E = (
    "é", "ée", "ées", "és", "èrent", "er", "era", "erai", "eraIent",
    "erais", "erait", "eras", "erez", "eriez", "erions", "erons",
    "eront", "ez", "iez",
)
_FR_S2B_A = (
    "â", "ât", "âtes", "a", "ai", "aIent", "ais", "ait", "ant",
    "ante", "antes", "ants", "as", "asse", "assent", "asses",
    "assiez", "assions", "âmes",
)
_FR_S2B_ALL = ("ions",) + _FR_S2B_E + _FR_S2B_A

# step 4 residual suffixes
_FR_S4 = ("ion", "ier", "ière", "Ier", "Ière", "e", "ë")
# a final s survives after these (step 4 precondition)
_FR_S4_KEEP_S_AFTER = set("aiouès")


def _fr_longest(word: str, sufs: tuple[str, ...]) -> str | None:
    """Snowball 'among' semantics (same discipline as _de_longest /
    _es_longest): the LONGEST matching suffix wins; a failed
    side-condition removes nothing (no backtracking to a shorter one)."""
    best = ""
    for s in sufs:
        if word.endswith(s) and len(s) > len(best):
            best = s
    return best or None


def _fr_prelude(word: str) -> str:
    """Mark vowel letters serving as consonants: u/i between vowels and
    u after q -> U/I; y next to a vowel (either side) -> Y. The marks are
    OUTSIDE the vowel set, so every later vowel test sees them as
    consonants; the postlude lowers them back."""
    out = list(word)
    for i, c in enumerate(out):
        prev = out[i - 1] if i else ""
        nxt = out[i + 1] if i + 1 < len(out) else ""
        if c == "u":
            if prev == "q" or (prev in _FR_VOWELS and nxt in _FR_VOWELS):
                out[i] = "U"
        elif c == "i":
            if prev in _FR_VOWELS and nxt in _FR_VOWELS:
                out[i] = "I"
        elif c == "y":
            if prev in _FR_VOWELS or nxt in _FR_VOWELS:
                out[i] = "Y"
    return "".join(out)


def _fr_regions(word: str) -> tuple[int, int, int]:
    """(r1, r2, rv) start offsets per the published definitions: standard
    R1/R2; RV = after the third letter when the word begins with two
    vowels or with par/col/tap, else after the first vowel not being the
    first letter; end of word when not found."""

    def scan(start: int) -> int:
        for i in range(start, len(word) - 1):
            if word[i] in _FR_VOWELS and word[i + 1] not in _FR_VOWELS:
                return i + 2
        return len(word)

    r1 = scan(0)
    r2 = scan(r1)
    n = len(word)
    if (
        word[:3] in ("par", "col", "tap")
        or (n >= 2 and word[0] in _FR_VOWELS and word[1] in _FR_VOWELS)
    ):
        rv = min(3, n)
    else:
        rv = n
        for i in range(1, n):
            if word[i] in _FR_VOWELS:
                rv = i + 1
                break
    return r1, r2, rv


def _fr_standard(word: str, r1: int, r2: int, rv: int) -> tuple[str, bool]:
    """Step 1 (standard suffixes). Returns (word, success). The
    amment/emment/ment(s) family performs its action but reports FAILURE
    — the published control flow runs the verb steps after them (the
    snowball source ends those rules with `fail`)."""
    suf = _fr_longest(word, _FR_S1_ALL)
    if suf is None:
        return word, False
    pos = len(word) - len(suf)
    if suf in _FR_S1_DELETE_R2:
        if pos >= r2:
            return word[:pos], True
        return word, False
    if suf in _FR_S1_ATEUR:
        if pos < r2:
            return word, False
        word = word[:pos]
        if word.endswith("ic"):
            if len(word) - 2 >= r2:
                word = word[:-2]
            else:
                word = word[:-2] + "iqU"
        return word, True
    if suf in ("logie", "logies"):
        if pos >= r2:
            return word[:pos] + "log", True
        return word, False
    if suf in ("usion", "ution", "usions", "utions"):
        if pos >= r2:
            return word[:pos] + "u", True
        return word, False
    if suf in ("ence", "ences"):
        if pos >= r2:
            return word[:pos] + "ent", True
        return word, False
    if suf in ("ement", "ements"):
        if pos < rv:
            return word, False
        word = word[:pos]
        if word.endswith("iv") and len(word) - 2 >= r2:
            word = word[:-2]
            if word.endswith("at") and len(word) - 2 >= r2:
                word = word[:-2]
        elif word.endswith("eus"):
            if len(word) - 3 >= r2:
                word = word[:-3]
            elif len(word) - 3 >= r1:
                word = word[:-3] + "eux"
        elif word.endswith("abl") and len(word) - 3 >= r2:
            word = word[:-3]
        elif word.endswith("iqU") and len(word) - 3 >= r2:
            word = word[:-3]
        elif word.endswith("ièr") and len(word) - 3 >= rv:
            word = word[:-3] + "i"
        elif word.endswith("Ièr") and len(word) - 3 >= rv:
            word = word[:-3] + "i"
        return word, True
    if suf in ("ité", "ités"):
        if pos < r2:
            return word, False
        word = word[:pos]
        if word.endswith("abil"):
            if len(word) - 4 >= r2:
                word = word[:-4]
            else:
                word = word[:-4] + "abl"
        elif word.endswith("ic"):
            if len(word) - 2 >= r2:
                word = word[:-2]
            else:
                word = word[:-2] + "iqU"
        elif word.endswith("iv") and len(word) - 2 >= r2:
            word = word[:-2]
        return word, True
    if suf in ("if", "ive", "ifs", "ives"):
        if pos < r2:
            return word, False
        word = word[:pos]
        if word.endswith("at") and len(word) - 2 >= r2:
            word = word[:-2]
            if word.endswith("ic"):
                if len(word) - 2 >= r2:
                    word = word[:-2]
                else:
                    word = word[:-2] + "iqU"
        return word, True
    if suf == "eaux":
        return word[:-4] + "eau", True
    if suf == "aux":
        if pos >= r1:
            return word[:pos] + "al", True
        return word, False
    if suf in ("euse", "euses"):
        if pos >= r2:
            return word[:pos], True
        if pos >= r1:
            return word[:pos] + "eux", True
        return word, False
    if suf in ("issement", "issements"):
        if pos >= r1 and pos >= 1 and word[pos - 1] not in _FR_VOWELS:
            return word[:pos], True
        return word, False
    if suf == "amment":
        if pos >= rv:
            word = word[:pos] + "ant"
        return word, False
    if suf == "emment":
        if pos >= rv:
            word = word[:pos] + "ent"
        return word, False
    # ment / ments: delete when preceded by a vowel that is itself in RV
    if pos >= 1 and pos - 1 >= rv and word[pos - 1] in _FR_VOWELS:
        word = word[:pos]
    return word, False


def _fr_i_verb(word: str, rv: int) -> tuple[str, bool]:
    """Step 2a: i-verb suffixes, all tests confined to RV — the suffix
    and its preceding NON-vowel must both lie in RV."""
    suf = _limited_longest(word, rv, _FR_S2A)
    if suf is None:
        return word, False
    pos = len(word) - len(suf)
    if pos >= 1 and pos - 1 >= rv and word[pos - 1] not in _FR_VOWELS:
        return word[:pos], True
    return word, False


def _fr_verb(word: str, r2: int, rv: int) -> tuple[str, bool]:
    """Step 2b: other verb suffixes within RV ('ions' additionally needs
    R2; the a-group deletes a preceding e when that e is in RV too)."""
    suf = _limited_longest(word, rv, _FR_S2B_ALL)
    if suf is None:
        return word, False
    pos = len(word) - len(suf)
    if pos < rv:
        return word, False
    if suf == "ions":
        if pos >= r2:
            return word[:pos], True
        return word, False
    if suf in _FR_S2B_E:
        return word[:pos], True
    word = word[:pos]
    if word.endswith("e") and len(word) - 1 >= rv:
        word = word[:-1]
    return word, True


def _fr_residual(word: str, r2: int, rv: int) -> str:
    """Step 4 (only when steps 1/2a/2b all failed): final-s removal, then
    the residual suffixes within RV."""
    if word.endswith("s") and (
        len(word) < 2 or word[-2] not in _FR_S4_KEEP_S_AFTER
    ):
        word = word[:-1]
    suf = _fr_longest(word, _FR_S4)
    if suf is not None:
        pos = len(word) - len(suf)
        if pos >= rv:
            if suf == "ion":
                if (
                    pos >= r2
                    and pos >= 1
                    and pos - 1 >= rv
                    and word[pos - 1] in ("s", "t")
                ):
                    word = word[:pos]
            elif suf in ("ier", "ière", "Ier", "Ière"):
                word = word[:pos] + "i"
            elif suf == "e":
                word = word[:pos]
            elif word[:pos].endswith("gu"):  # ë preceded by gu
                word = word[:pos]
    return word


def stem_fr(word: str) -> str:
    """Snowball-French-stem one lowercase word."""
    word = _fr_prelude(word.lower())
    r1, r2, rv = _fr_regions(word)

    word, success = _fr_standard(word, r1, r2, rv)
    if not success:
        word, success = _fr_i_verb(word, rv)
        if not success:
            word, success = _fr_verb(word, r2, rv)

    if success:
        # step 3: tidy the changed ending
        if word.endswith("Y"):
            word = word[:-1] + "i"
        elif word.endswith("ç"):
            word = word[:-1] + "c"
    else:
        word = _fr_residual(word, r2, rv)

    # step 5: undouble
    for end in ("enn", "onn", "ett", "ell", "eill"):
        if word.endswith(end):
            word = word[:-1]
            break

    # step 6: un-accent é/è before a trailing non-vowel run
    i = len(word) - 1
    while i >= 0 and word[i] not in _FR_VOWELS:
        i -= 1
    if 0 <= i < len(word) - 1 and word[i] in ("é", "è"):
        word = word[:i] + "e" + word[i + 1:]

    # postlude: lower the consonant marks back
    return word.translate(_FR_UNMARK)


_FR_UNMARK = str.maketrans("IUY", "iuy")


# The published Snowball French stopword list (snowballstem.org
# french/stop.txt): articles/pronouns/particles, the elided single-letter
# forms, and the full être/avoir conjugation tables (incl. the participle
# forms étante/étants/étantes, ayante/ayantes/ayants), as carried by the
# widely-redistributed version of the file.
SNOWBALL_STOP_FR = frozenset("""
au aux avec ce ces dans de des du elle en et eux il ils je la le les
leur lui ma mais me même mes moi mon ne nos notre nous on ou par pas
pour qu que qui sa se ses son sur ta te tes toi ton tu un une vos votre
vous c d j l à m n s t y été étée étées étés étant étante étants
étantes suis es est sommes êtes sont serai seras sera serons serez
seront serais serait serions seriez seraient étais était étions étiez
étaient fus fut fûmes fûtes furent sois soit soyons soyez soient fusse
fusses fût fussions fussiez fussent ayant ayante ayantes ayants eu eue
eues eus ai as avons avez ont aurai auras aura aurons aurez auront
aurais aurait aurions auriez auraient avais avait avions aviez avaient
eut eûmes eûtes eurent aie aies ait ayons ayez aient eusse eusses eût
eussions eussiez eussent
""".split())


# --------------------------------------------------------------- Italian
# Snowball Italian stemmer (snowballstem.org "italian" algorithm) — the
# stemmer LanguageAnalyzer("it") selects in the reference via
# lang.stemmer_for_language (reference data: src/whoosh/lang/snowball/
# italian.py + lang/stopwords.py 'it'). Independent implementation from
# the PUBLISHED algorithm description (the reference mount is empty —
# SURVEY "Provenance"); parity is pinned by hand-executed vectors from
# the spec in tests/test_lang_it.py.

_IT_VOWELS = set("aeiouàèìòù")
_IT_ACUTE_TO_GRAVE = str.maketrans("áéíóú", "àèìòù")

# step 0: attached pronouns, longest-match, after ando/endo (delete) or
# ar/er/ir (replace the pronoun with 'e'), the preceding group in RV
_IT_PRONOUNS = (
    "ci", "gli", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi",
    "sene", "gliela", "gliele", "glieli", "glielo", "gliene",
    "mela", "mele", "meli", "melo", "mene",
    "tela", "tele", "teli", "telo", "tene",
    "cela", "cele", "celi", "celo", "cene",
    "vela", "vele", "veli", "velo", "vene",
)

# step 1 suffix groups (see stem_it for actions)
_IT_S1_DELETE_R2 = (
    "anza", "anze", "ico", "ici", "ica", "ice", "iche", "ichi",
    "ismo", "ismi", "abile", "abili", "ibile", "ibili", "ista", "iste",
    "isti", "istà", "istè", "istì", "oso", "osi", "osa", "ose", "mente",
    "atrice", "atrici", "ante", "anti",
)
_IT_S1_AZIONE = ("azione", "azioni", "atore", "atori")
_IT_S1_ALL = _IT_S1_DELETE_R2 + _IT_S1_AZIONE + (
    "logia", "logie", "uzione", "uzioni", "usione", "usioni",
    "enza", "enze", "amento", "amenti", "imento", "imenti",
    "amente", "ità", "ivo", "ivi", "iva", "ive",
)

# step 2 verb suffixes, plain RV delete ('Iamo' arises from the prelude:
# i between vowels is marked, e.g. creiamo -> creIamo)
_IT_S2 = (
    "ammo", "ando", "ano", "are", "arono", "asse", "assero", "assi",
    "assimo", "ata", "ate", "ati", "ato", "ava", "avamo", "avano",
    "avate", "avi", "avo", "emmo", "enda", "ende", "endi", "endo",
    "erà", "erai", "eranno", "ere", "erebbe", "erebbero", "erei",
    "eremmo", "eremo", "ereste", "eresti", "erete", "erò", "erono",
    "essero", "ete", "eva", "evamo", "evano", "evate", "evi", "evo",
    "iamo", "Iamo", "immo", "irà", "irai", "iranno", "ire", "irebbe",
    "irebbero", "irei", "iremmo", "iremo", "ireste", "iresti", "irete",
    "irò", "irono", "isca", "iscano", "isce", "isci", "isco", "iscono",
    "issero", "ita", "ite", "iti", "ito", "iva", "ivamo", "ivano",
    "ivate", "ivi", "ivo", "ono", "uta", "ute", "uti", "uto", "ar", "ir",
)

_IT_S3A_FINAL = set("aeioàèìò")


def _it_prelude(word: str) -> str:
    """Acute accents -> grave, then mark u after q and u/i between vowels
    (U/I are outside the vowel set, so later vowel tests see consonants;
    the postlude lowers them back)."""
    word = word.translate(_IT_ACUTE_TO_GRAVE)
    out = list(word)
    for i, c in enumerate(out):
        prev = out[i - 1] if i else ""
        nxt = out[i + 1] if i + 1 < len(out) else ""
        if c == "u":
            if prev == "q" or (prev in _IT_VOWELS and nxt in _IT_VOWELS):
                out[i] = "U"
        elif c == "i":
            if prev in _IT_VOWELS and nxt in _IT_VOWELS:
                out[i] = "I"
    return "".join(out)


def _it_regions(word: str) -> tuple[int, int, int]:
    """(r1, r2, rv): standard R1/R2; RV per the Spanish definition the
    Italian spec shares (second letter consonant -> after the next vowel;
    two leading vowels -> after the next consonant; else after the third
    letter; end of word when shorter than 3)."""

    def scan(start: int) -> int:
        for i in range(start, len(word) - 1):
            if word[i] in _IT_VOWELS and word[i + 1] not in _IT_VOWELS:
                return i + 2
        return len(word)

    r1 = scan(0)
    r2 = scan(r1)
    n = len(word)
    if n < 3:
        rv = n
    elif word[1] not in _IT_VOWELS:
        rv = n
        for i in range(2, n):
            if word[i] in _IT_VOWELS:
                rv = i + 1
                break
    elif word[0] in _IT_VOWELS and word[1] in _IT_VOWELS:
        rv = n
        for i in range(2, n):
            if word[i] not in _IT_VOWELS:
                rv = i + 1
                break
    else:
        rv = 3
    return r1, r2, rv


def stem_it(word: str) -> str:
    """Snowball-Italian-stem one lowercase word."""
    word = _it_prelude(word.lower())
    r1, r2, rv = _it_regions(word)

    # ---- step 0: attached pronoun after a gerund/infinitive form in RV
    pro = _fr_longest(word, _IT_PRONOUNS)
    if pro is not None:
        base = word[: -len(pro)]
        for pre in ("ando", "endo"):
            if base.endswith(pre) and len(base) - len(pre) >= rv:
                word = base
                break
        else:
            for pre in ("ar", "er", "ir"):
                if base.endswith(pre) and len(base) - len(pre) >= rv:
                    word = base + "e"
                    break

    changed = False

    # ---- step 1: standard suffixes (longest across ALL groups; the
    # winner's group decides the action)
    suf = _fr_longest(word, _IT_S1_ALL)
    if suf is not None:
        pos = len(word) - len(suf)
        if suf in _IT_S1_DELETE_R2:
            if pos >= r2:
                word = word[:pos]
                changed = True
        elif suf in _IT_S1_AZIONE:
            if pos >= r2:
                word = word[:pos]
                changed = True
                if word.endswith("ic") and len(word) - 2 >= r2:
                    word = word[:-2]
        elif suf in ("logia", "logie"):
            if pos >= r2:
                word = word[:pos] + "log"
                changed = True
        elif suf in ("uzione", "uzioni", "usione", "usioni"):
            if pos >= r2:
                word = word[:pos] + "u"
                changed = True
        elif suf in ("enza", "enze"):
            if pos >= r2:
                word = word[:pos] + "ente"
                changed = True
        elif suf in ("amento", "amenti", "imento", "imenti"):
            if pos >= rv:
                word = word[:pos]
                changed = True
        elif suf == "amente":
            if pos >= r1:
                word = word[:pos]
                changed = True
                if word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("at") and len(word) - 2 >= r2:
                        word = word[:-2]
                else:
                    for pre in ("os", "ic"):
                        if word.endswith(pre) and len(word) - 2 >= r2:
                            word = word[:-2]
                            break
                    else:
                        if word.endswith("abil") and len(word) - 4 >= r2:
                            word = word[:-4]
        elif suf == "ità":
            if pos >= r2:
                word = word[:pos]
                changed = True
                for pre in ("abil", "ic", "iv"):
                    if word.endswith(pre) and len(word) - len(pre) >= r2:
                        word = word[: -len(pre)]
                        break
        else:  # ivo ivi iva ive
            if pos >= r2:
                word = word[:pos]
                changed = True
                if word.endswith("at") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("ic") and len(word) - 2 >= r2:
                        word = word[:-2]

    # ---- step 2 (only when step 1 removed nothing): verb suffixes in RV
    if not changed:
        suf = _limited_longest(word, rv, _IT_S2)
        if suf is not None:
            pos = len(word) - len(suf)
            if pos >= rv:
                word = word[:pos]

    # ---- step 3a: final vowel (and a preceding i) in RV — always tried
    if word and word[-1] in _IT_S3A_FINAL and len(word) - 1 >= rv:
        word = word[:-1]
        if word.endswith("i") and len(word) - 1 >= rv:
            word = word[:-1]

    # ---- step 3b: final ch/gh -> c/g in RV
    if (
        (word.endswith("ch") or word.endswith("gh"))
        and len(word) - 2 >= rv
    ):
        word = word[:-1]

    # ---- postlude: lower the consonant marks back
    return word.translate(_IT_UNMARK)


_IT_UNMARK = str.maketrans("IU", "iu")


# The published Snowball Italian stopword list (snowballstem.org
# italian/stop.txt): articles/prepositions (with their elided and
# articulated forms), pronouns/possessives/demonstratives, and the full
# avere/essere/fare/stare conjugation tables.
SNOWBALL_STOP_IT = frozenset("""
ad al allo ai agli all agl alla alle con col coi da dal dallo dai dagli
dall dagl dalla dalle di del dello dei degli dell degl della delle in
nel nello nei negli nell negl nella nelle su sul sullo sui sugli sull
sugl sulla sulle per tra contro io tu lui lei noi voi loro mio mia miei
mie tuo tua tuoi tue suo sua suoi sue nostro nostra nostri nostre
vostro vostra vostri vostre mi ti ci vi lo la li le gli ne il un uno
una ma ed se perché anche come dov dove che chi cui non più quale
quanto quanti quanta quante quello quelli quella quelle questo questi
questa queste si tutto tutti a c e i l o ho hai ha abbiamo avete hanno
abbia abbiate abbiano avrò avrai avrà avremo avrete avranno avrei
avresti avrebbe avremmo avreste avrebbero avevo avevi aveva avevamo
avevate avevano ebbi avesti ebbe avemmo aveste ebbero avessi avesse
avessimo avessero avendo avuto avuta avuti avute sono sei è siamo siete
sia siate siano sarò sarai sarà saremo sarete saranno sarei saresti
sarebbe saremmo sareste sarebbero ero eri era eravamo eravate erano fui
fosti fu fummo foste furono fossi fosse fossimo fossero essendo faccio
fai facciamo fanno faccia facciate facciano farò farai farà faremo
farete faranno farei faresti farebbe faremmo fareste farebbero facevo
facevi faceva facevamo facevate facevano feci facesti fece facemmo
faceste fecero facessi facesse facessimo facessero facendo sto stai sta
stiamo stanno stia stiate stiano starò starai starà staremo starete
staranno starei staresti starebbe staremmo stareste starebbero stavo
stavi stava stavamo stavate stavano stetti stesti stette stemmo steste
stettero stessi stesse stessimo stessero stando
""".split())


# ---------------------------------------------------------------------------
# Snowball Russian stemmer.
#
# Independent implementation of the PUBLISHED Snowball Russian algorithm
# (snowballstem.org 'russian'; reference surface: src/whoosh/lang/snowball/
# russian.py via analysis/analyzers.py::LanguageAnalyzer). Unlike the romance
# stemmers above, the whole backward pass runs under `setlimit tomark pV`, so
# EVERY suffix search (not just the removal test) is confined to the RV
# window: a literal longer than RV simply never matches and the next-longest
# one is considered instead. Group-1 endings delete only when preceded by
# а/я (the а/я stays, and must itself lie inside RV); a failed group-1
# precondition fails the whole class — snowball's `among` commits to the
# longest literal and never backtracks to a shorter one.

_RU_VOWELS = frozenset("аеиоуыэюя")


def _ru_sorted(pairs):
    return tuple(sorted(pairs, key=lambda p: -len(p[0])))


_RU_PERFECTIVE_GERUND = _ru_sorted(
    [("в", 1), ("вши", 1), ("вшись", 1),
     ("ив", 2), ("ивши", 2), ("ившись", 2),
     ("ыв", 2), ("ывши", 2), ("ывшись", 2)]
)
_RU_REFLEXIVE = _ru_sorted([("ся", 2), ("сь", 2)])
_RU_ADJECTIVE = _ru_sorted(
    [(s, 2) for s in (
        "ее ие ые ое ими ыми ей ий ый ой ем им ым ом его ого ему ому "
        "их ых ую юю ая яя ою ею"
    ).split()]
)
_RU_PARTICIPLE = _ru_sorted(
    [("ем", 1), ("нн", 1), ("вш", 1), ("ющ", 1), ("щ", 1),
     ("ивш", 2), ("ывш", 2), ("ующ", 2)]
)
_RU_VERB = _ru_sorted(
    [(s, 1) for s in (
        "ла на ете йте ли й л ем н ло но ет ют ны ть ешь нно"
    ).split()]
    + [(s, 2) for s in (
        "ила ыла ена ейте уйте ите или ыли ей уй ил ыл им ым ен ило ыло "
        "ено ят ует уют ит ыт ены ить ыть ишь ю ую"
    ).split()]
)
_RU_NOUN = _ru_sorted(
    [(s, 2) for s in (
        "а ев ов ие ье е иями ями ами еи ии и ией ей ой ий й иям ям ием "
        "ем ам ом о у ах иях ях ы ь ию ью ю ия ья я"
    ).split()]
)
_RU_SUPERLATIVE = _ru_sorted([("ейш", 2), ("ейше", 2)])
_RU_DERIVATIONAL = _ru_sorted([("ост", 2), ("ость", 2)])


def _ru_regions(word: str) -> tuple[int, int]:
    """(r2, rv) as absolute character offsets into ``word``.

    RV: after the first vowel. R1: after the first non-vowel following a
    vowel; R2: the same, computed inside R1 (so R2 ⊆ R1 ⊆ RV never holds
    by definition, but for Russian R1 always starts past RV, making the
    step-3 R2 test strictly tighter than the RV window).
    """
    n = len(word)
    rv = n
    for i, ch in enumerate(word):
        if ch in _RU_VOWELS:
            rv = i + 1
            break
    r1 = n
    for i in range(1, n):
        if word[i] not in _RU_VOWELS and word[i - 1] in _RU_VOWELS:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in _RU_VOWELS and word[i - 1] in _RU_VOWELS:
            r2 = i + 1
            break
    return r2, rv


def _ru_find(word: str, rv: int, pairs):
    """Longest suffix among ``pairs`` lying wholly inside the RV window."""
    lim = len(word) - rv
    for sfx, grp in pairs:
        if len(sfx) <= lim and word.endswith(sfx):
            return sfx, grp
    return None


def _ru_strip(word: str, rv: int, pairs) -> tuple[str, bool]:
    m = _ru_find(word, rv, pairs)
    if m is None:
        return word, False
    sfx, grp = m
    pos = len(word) - len(sfx)
    if grp == 1 and (pos - 1 < rv or word[pos - 1] not in "ая"):
        # among committed to this literal; a failed group-1 precondition
        # fails the whole class (no retry of a shorter suffix)
        return word, False
    return word[:pos], True


def stem_ru(word: str) -> str:
    """Snowball-Russian-stem one word (ё is normalized to е first)."""
    word = word.lower().replace("ё", "е")
    r2, rv = _ru_regions(word)

    # ---- step 1: perfective gerund, else [reflexive] then the first of
    # adjectival / verb / noun (the reflexive removal stands even when no
    # later class matches — snowball deletions are not rolled back)
    w, ok = _ru_strip(word, rv, _RU_PERFECTIVE_GERUND)
    if ok:
        word = w
    else:
        word, _ = _ru_strip(word, rv, _RU_REFLEXIVE)
        w, ok = _ru_strip(word, rv, _RU_ADJECTIVE)
        if ok:
            # adjectival: the adjective ending may hide a participle one
            word = _ru_strip(w, rv, _RU_PARTICIPLE)[0]
        else:
            w, ok = _ru_strip(word, rv, _RU_VERB)
            if ok:
                word = w
            else:
                word, _ = _ru_strip(word, rv, _RU_NOUN)

    # ---- step 2: a final и in RV
    if len(word) - rv >= 1 and word.endswith("и"):
        word = word[:-1]

    # ---- step 3: derivational ост/ость, additionally required to be in R2
    m = _ru_find(word, rv, _RU_DERIVATIONAL)
    if m is not None and len(word) - len(m[0]) >= r2:
        word = word[: -len(m[0])]

    # ---- step 4: undouble нн | superlative (then undouble) | final ь
    if len(word) - rv >= 2 and word.endswith("нн"):
        word = word[:-1]
    else:
        m = _ru_find(word, rv, _RU_SUPERLATIVE)
        if m is not None:
            word = word[: -len(m[0])]
            if len(word) - rv >= 2 and word.endswith("нн"):
                word = word[:-1]
        elif len(word) - rv >= 1 and word.endswith("ь"):
            word = word[:-1]
    return word


# The published Snowball Russian stopword list (snowballstem.org
# russian/stop.txt): conjunctions/prepositions/particles, the personal and
# demonstrative pronoun declensions, and the high-frequency быть forms.
SNOWBALL_STOP_RU = frozenset("""
и в во не что он на я с со как а то все она так его но да ты к у же вы
за бы по только ее мне было вот от меня еще нет о из ему теперь когда
даже ну вдруг ли если уже или ни быть был него до вас нибудь опять уж
вам ведь там потом себя ничего ей может они тут где есть надо ней для
мы тебя их чем была сам чтоб без будто чего раз тоже себе под будет ж
тогда кто этот того потому этого какой совсем ним здесь этом один
почти мой тем чтобы нее сейчас были куда зачем всех никогда можно при
наконец два об другой хоть после над больше тот через эти нас про
всего них какая много разве три эту моя впрочем хорошо свою этой перед
иногда лучше чуть том нельзя такой им более всегда конечно всю между
""".split())


# ------------------------------------------------------------- Portuguese
# Snowball Portuguese stemmer (snowballstem.org "portuguese" algorithm) —
# the stemmer LanguageAnalyzer("pt") selects in the reference via
# lang.stemmer_for_language (reference data: src/whoosh/lang/snowball/
# portuguese.py + lang/stopwords.py 'pt'). Independent implementation from
# the PUBLISHED algorithm description (the reference mount is empty —
# SURVEY "Provenance"); parity is pinned by hand-executed vectors from the
# spec in tests/test_lang_pt.py. The prelude marks the nasal vowels
# (ã -> a~, õ -> o~) so suffix literals like aça~o/aço~es match the
# published tables; the postlude restores them.

_PT_VOWELS = set("aeiouáéíóúâêô")

_PT_S1_DELETE_R2 = (
    "eza", "ezas", "ico", "ica", "icos", "icas", "ismo", "ismos",
    "ável", "ível", "ista", "istas", "oso", "osa", "osos", "osas",
    "amento", "amentos", "imento", "imentos",
)
_PT_S1_ADOR = (
    "adora", "ador", "aça~o", "adoras", "adores", "aço~es",
    "ante", "antes", "ância",
)
_PT_S1_ALL = (
    _PT_S1_DELETE_R2 + _PT_S1_ADOR
    + ("logia", "logias", "uça~o", "uço~es", "ência", "ências",
       "amente", "mente", "idade", "idades", "iva", "ivo", "ivas", "ivos",
       "ira", "iras")
)

_PT_S2 = (
    "ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara", "erá",
    "era", "irá", "ava", "asse", "esse", "isse", "aste", "este", "iste",
    "ei", "arei", "erei", "irei", "am", "iam", "ariam", "eriam", "iriam",
    "aram", "eram", "iram", "avam", "em", "arem", "erem", "irem",
    "assem", "essem", "issem", "ado", "ido", "ando", "endo", "indo",
    "ara~o", "era~o", "ira~o", "ar", "er", "ir", "as", "adas", "idas",
    "ias", "arias", "erias", "irias", "arás", "aras", "erás", "eras",
    "irás", "avas", "es", "ardes", "erdes", "irdes", "ares", "eres",
    "ires", "asses", "esses", "isses", "astes", "estes", "istes", "is",
    "ais", "eis", "íeis", "aríeis", "eríeis", "iríeis", "áreis",
    "areis", "éreis", "ereis", "íreis", "ireis", "ásseis", "ésseis",
    "ísseis", "ásteis", "ésteis", "ísteis", "ados", "idos", "ámos",
    "amos", "íamos", "aríamos", "eríamos", "iríamos", "áramos",
    "éramos", "íramos", "ávamos", "emos", "aremos", "eremos", "iremos",
    "ássemos", "êssemos", "íssemos", "imos", "armos", "ermos", "irmos",
    "eu", "iu", "ou", "ira", "iras",
)
_PT_S4 = ("os", "a", "i", "o", "á", "í", "ó")


def _pt_regions(word: str) -> tuple[int, int, int]:
    """(r1, r2, rv) start offsets per the published definitions — same
    R1/R2/RV construction as Spanish, over the Portuguese vowel set (the
    nasal-mark ~ is a non-vowel, exactly as in the published source)."""

    def scan(start: int) -> int:
        for i in range(start, len(word) - 1):
            if word[i] in _PT_VOWELS and word[i + 1] not in _PT_VOWELS:
                return i + 2
        return len(word)

    r1 = scan(0)
    r2 = scan(r1)
    n = len(word)
    if n < 3:
        rv = n
    elif word[1] not in _PT_VOWELS:
        rv = n
        for i in range(2, n):
            if word[i] in _PT_VOWELS:
                rv = i + 1
                break
    elif word[0] in _PT_VOWELS and word[1] in _PT_VOWELS:
        rv = n
        for i in range(2, n):
            if word[i] not in _PT_VOWELS:
                rv = i + 1
                break
    else:
        rv = 3
    return r1, r2, rv


def stem_pt(word: str) -> str:
    """Snowball-Portuguese-stem one lowercase word."""
    word = word.lower().replace("ã", "a~").replace("õ", "o~")
    r1, r2, rv = _pt_regions(word)

    changed = False

    # ---- step 1: standard suffix removal (longest across ALL groups;
    # the group the winner belongs to decides the action)
    suf = _es_longest(word, _PT_S1_ALL)
    if suf is not None:
        pos = len(word) - len(suf)
        if suf in _PT_S1_DELETE_R2:
            if pos >= r2:
                word = word[:pos]
                changed = True
        elif suf in _PT_S1_ADOR:
            if pos >= r2:
                word = word[:pos]
                changed = True
                if word.endswith("ic") and len(word) - 2 >= r2:
                    word = word[:-2]
        elif suf in ("logia", "logias"):
            if pos >= r2:
                word = word[:pos] + "log"
                changed = True
        elif suf in ("uça~o", "uço~es"):
            if pos >= r2:
                word = word[:pos] + "u"
                changed = True
        elif suf in ("ência", "ências"):
            if pos >= r2:
                word = word[:pos] + "ente"
                changed = True
        elif suf == "amente":
            if pos >= r1:
                word = word[:pos]
                changed = True
                if word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("at") and len(word) - 2 >= r2:
                        word = word[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if word.endswith(pre) and len(word) - 2 >= r2:
                            word = word[:-2]
                            break
        elif suf == "mente":
            if pos >= r2:
                word = word[:pos]
                changed = True
                for pre in ("ante", "avel", "ível"):
                    if word.endswith(pre) and len(word) - 4 >= r2:
                        word = word[:-4]
                        break
        elif suf in ("idade", "idades"):
            if pos >= r2:
                word = word[:pos]
                changed = True
                for pre in ("abil", "ic", "iv"):
                    if word.endswith(pre) and len(word) - len(pre) >= r2:
                        word = word[: -len(pre)]
                        break
        elif suf in ("iva", "ivo", "ivas", "ivos"):
            if pos >= r2:
                word = word[:pos]
                changed = True
                if word.endswith("at") and len(word) - 2 >= r2:
                    word = word[:-2]
        else:  # ira iras: -> ir when in RV and preceded by e
            if pos >= rv and pos >= 1 and word[pos - 1] == "e":
                word = word[:pos] + "ir"
                changed = True

    # ---- step 2 (only when step 1 removed nothing): verb suffixes in RV
    if not changed:
        suf = _limited_longest(word, rv, _PT_S2)
        if suf is not None:
            pos = len(word) - len(suf)
            if pos >= rv:
                word = word[:pos]
                changed = True

    # ---- step 3 (only when step 1 or 2 removed something): final i
    # preceded by c, the i in RV
    if changed:
        if (
            word.endswith("ci")
            and len(word) - 1 >= rv
        ):
            word = word[:-1]
    else:
        # ---- step 4 (only when steps 1 AND 2 both failed): residual
        suf = _es_longest(word, _PT_S4)
        if suf is not None:
            pos = len(word) - len(suf)
            if pos >= rv:
                word = word[:pos]

    # ---- step 5 (always): residual e/é/ê in RV, with the gu/ci pair
    # collapse; or a bare trailing cedilla
    if word and word[-1] in ("e", "é", "ê") and len(word) - 1 >= rv:
        word = word[:-1]
        if word.endswith("gu") and len(word) - 1 >= rv:
            word = word[:-1]
        elif word.endswith("ci") and len(word) - 1 >= rv:
            word = word[:-1]
    elif word.endswith("ç"):
        word = word[:-1] + "c"

    # ---- postlude: restore the nasal vowels
    return word.replace("a~", "ã").replace("o~", "õ")


# The published Snowball Portuguese stopword list (snowballstem.org
# portuguese/stop.txt): articles/prepositions and their contractions,
# pronouns/possessives/demonstratives, and the full estar/haver/ser/ter
# conjugation tables.
SNOWBALL_STOP_PT = frozenset("""
de a o que e do da em um para é com não uma os no se na por mais as dos
como mas foi ao ele das tem à seu sua ou ser quando muito há nos já
está eu também só pelo pela até isso ela entre era depois sem mesmo aos
ter seus quem nas me esse eles estão você tinha foram essa num nem suas
meu às minha têm numa pelos elas havia seja qual será nós tenho lhe
deles essas esses pelas este fosse dele tu te vocês vos lhes meus
minhas teu tua teus tuas nosso nossa nossos nossas dela delas esta
estes estas aquele aquela aqueles aquelas isto aquilo estou estamos
estive esteve estivemos estiveram estava estávamos estavam estivera
estivéramos esteja estejamos estejam estivesse estivéssemos estivessem
estiver estivermos estiverem hei havemos hão houve houvemos houveram
houvera houvéramos haja hajamos hajam houvesse houvéssemos houvessem
houver houvermos houverem houverei houverá houveremos houverão houveria
houveríamos houveriam sou somos são éramos eram fui fomos fora fôramos
sejamos sejam fôssemos fossem for formos forem serei seremos serão
seria seríamos seriam temos tinham tínhamos tive teve tivemos tiveram
tivera tivéramos tenha tenhamos tenham tivesse tivéssemos tivessem
tiver tivermos tiverem terei terá teremos terão teria teríamos teriam
""".split())


# ------------------------------------------------------- Swedish/Norwegian
# Snowball Swedish and Norwegian stemmers (snowballstem.org "swedish" /
# "norwegian" algorithms) — the stemmers LanguageAnalyzer("sv"/"no")
# select in the reference via lang.stemmer_for_language (reference data:
# src/whoosh/lang/snowball/{swedish,norwegian}.py + lang/stopwords.py).
# Independent implementations from the PUBLISHED algorithm descriptions
# (the reference mount is empty — SURVEY "Provenance"); parity pinned by
# hand-executed vectors in tests/test_lang_nordic.py. Both use one region:
# R1, adjusted so at least 3 letters precede it, and ALL suffix searches
# run inside the R1 window (`setlimit tomark p1` — _limited_longest); only
# the valid-s-ending look-behind reads outside the window, per the spec.


def _nordic_r1(word: str, vowels: set) -> int:
    n = len(word)
    r1 = n
    for i in range(1, n):
        if word[i] not in vowels and word[i - 1] in vowels:
            r1 = i + 1
            break
    return max(r1, 3) if r1 < n else r1


_SV_VOWELS = set("aeiouyäåö")
_SV_S1 = (
    "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
    "arne", "are", "aste", "en", "anden", "aren", "heten", "ern", "ar",
    "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es", "ades",
    "andes", "ens", "arens", "hetens", "erns", "at", "andet", "het",
    "ast", "s",
)
_SV_S_END = set("bcdfghjklmnoprtvy")
_SV_S2 = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")
_SV_S3 = ("lig", "ig", "els", "löst", "fullt")


def stem_sv(word: str) -> str:
    """Snowball-Swedish-stem one lowercase word."""
    word = word.lower()
    r1 = _nordic_r1(word, _SV_VOWELS)

    # ---- step 1: main suffix in R1 ('s' needs a valid s-ending before
    # it, which may sit outside R1)
    suf = _limited_longest(word, r1, _SV_S1)
    if suf is not None:
        pos = len(word) - len(suf)
        if suf != "s":
            word = word[:pos]
        elif pos >= 1 and word[pos - 1] in _SV_S_END:
            word = word[:pos]

    # ---- step 2: consonant-pair suffix in R1 -> drop the last letter
    if _limited_longest(word, r1, _SV_S2) is not None:
        word = word[:-1]

    # ---- step 3: residual suffix in R1
    suf = _limited_longest(word, r1, _SV_S3)
    if suf in ("lig", "ig", "els"):
        word = word[: -len(suf)]
    elif suf == "löst":
        word = word[:-1]
    elif suf == "fullt":
        word = word[:-1]
    return word


_NO_VOWELS = set("aeiouyæåø")
_NO_S1 = (
    "a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en",
    "heten", "ar", "er", "heter", "or", "as", "es", "edes", "endes",
    "enes", "hetenes", "ens", "hetens", "ers", "ets", "et", "het",
    "ast", "s", "erte", "ert",
)
_NO_S_END = set("bcdfghjlmnoprtvyz")
_NO_S2 = ("dt", "vt")
_NO_S3 = (
    "leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov", "elov",
    "slov", "hetslov",
)


def stem_no(word: str) -> str:
    """Snowball-Norwegian-stem one lowercase word."""
    word = word.lower()
    r1 = _nordic_r1(word, _NO_VOWELS)

    # ---- step 1: main suffix in R1; 's' needs a valid s-ending (which
    # may sit outside R1; 'k' counts only after a non-vowel); erte/ert
    # become er
    suf = _limited_longest(word, r1, _NO_S1)
    if suf is not None:
        pos = len(word) - len(suf)
        if suf in ("erte", "ert"):
            word = word[:pos] + "er"
        elif suf != "s":
            word = word[:pos]
        elif pos >= 1 and (
            word[pos - 1] in _NO_S_END
            or (
                word[pos - 1] == "k"
                and pos >= 2
                and word[pos - 2] not in _NO_VOWELS
            )
        ):
            word = word[:pos]

    # ---- step 2: dt/vt in R1 -> drop the t
    if _limited_longest(word, r1, _NO_S2) is not None:
        word = word[:-1]

    # ---- step 3: residual suffix in R1 -> delete
    suf = _limited_longest(word, r1, _NO_S3)
    if suf is not None:
        word = word[: -len(suf)]
    return word


# The published Snowball Swedish stopword list (snowballstem.org
# swedish/stop.txt).
SNOWBALL_STOP_SV = frozenset("""
och det att i en jag hon som han på den med var sig för så till är men
ett om hade de av icke mig du henne då sin nu har inte hans honom
skulle hennes där min man ej vid kunde något från ut när efter upp vi
dem vara vad över än dig kan sina här ha mot alla under någon eller
allt mycket sedan ju denna själv detta åt utan varit hur ingen mitt ni
bli blev oss din dessa några deras blir mina samma vilken er sådan vår
blivit dess inom mellan sådant varför varje vilka ditt vem vilket sitta
sådana vart dina vars vårt våra ert era vilkas
""".split())

# The published Snowball Norwegian stopword list (snowballstem.org
# norwegian/stop.txt).
SNOWBALL_STOP_NO = frozenset("""
og i jeg det at en et den til er som på de med han av ikke ikkje der så
var meg seg men ett har om vi min mitt ha hadde hun nå over da ved fra
du ut sin dem oss opp man kan hans hvor eller hva skal selv sjøl her
alle vil bli ble blei blitt kunne inn når være kom noen noe ville dere
deres kun ja etter ned skulle denne for deg si sine sitt mot å meget
hvorfor dette disse uten hvordan ingen din ditt blir samme hvilken
hvilke sånn inni mellom vår hver hvem vors hvis både bare enn fordi før
mange også slik vært båe begge siden dykk dykkar dei deira deires deim
di då eg ein eit eitt elles honom hjå ho hoe henne hennar hennes hoss
hossen ingi inkje korleis korso kva kvar kvarhelst kven kvi kvifor me
medan mi mine mykje no nokon noka nokor noko nokre sia sidan so somt
somme um upp vere vort varte vart
""".split())


# ----------------------------------------------------------------- Danish
# Snowball Danish stemmer (snowballstem.org "danish" algorithm) — the
# stemmer LanguageAnalyzer("da") selects in the reference via
# lang.stemmer_for_language (reference data: src/whoosh/lang/snowball/
# danish.py + lang/stopwords.py 'da'). Independent implementation from
# the PUBLISHED algorithm description (the reference mount is empty —
# SURVEY "Provenance"); parity pinned by hand-executed vectors in
# tests/test_lang_da.py. Danish shares the Scandinavian single-R1
# discipline with Swedish/Norwegian (_nordic_r1, min-3 adjusted, all
# suffix searches inside the R1 window) and adds two quirks of its own:
# the igst pre-step of step 3 runs UNLIMITED (outside R1), and step 4
# undoubles a final double consonant whose last letter sits in R1.

_DA_VOWELS = set("aeiouyæåø")
_DA_S1 = (
    "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
    "erne", "ere", "en", "heden", "eren", "er", "heder", "erer",
    "heds", "es", "endes", "erendes", "enes", "ernes", "eres", "ens",
    "hedens", "erens", "ers", "ets", "erets", "et", "eret",
)
# the Danish valid s-endings famously include the vowels a, o and å
_DA_S_END = set("abcdfghjklmnoprtvyzå")
_DA_S2 = ("gd", "dt", "gt", "kt")
_DA_S3 = ("ig", "lig", "elig", "els")


def _da_consonant_pair(word: str, r1: int) -> str:
    # step 2: a gd/dt/gt/kt pair wholly inside R1 -> drop the last letter
    if _limited_longest(word, r1, _DA_S2) is not None:
        return word[:-1]
    return word


def stem_da(word: str) -> str:
    """Snowball-Danish-stem one lowercase word."""
    word = word.lower()
    r1 = _nordic_r1(word, _DA_VOWELS)

    # ---- step 1: main suffix in R1 ('s' needs a valid s-ending before
    # it, which may sit outside R1)
    suf = _limited_longest(word, r1, _DA_S1 + ("s",))
    if suf is not None:
        pos = len(word) - len(suf)
        if suf != "s":
            word = word[:pos]
        elif pos >= 1 and word[pos - 1] in _DA_S_END:
            word = word[:pos]

    # ---- step 2: consonant pair in R1 -> drop the last letter
    word = _da_consonant_pair(word, r1)

    # ---- step 3: the igst pre-step is NOT R1-limited (the published
    # routine runs `do(['st'] 'ig' delete)` before the setlimit)
    if word.endswith("igst"):
        word = word[:-2]
    suf = _limited_longest(word, r1, _DA_S3 + ("løst",))
    if suf == "løst":
        word = word[:-1]
    elif suf is not None:
        word = word[: -len(suf)]
        word = _da_consonant_pair(word, r1)

    # ---- step 4 (undouble): final double consonant with its LAST letter
    # inside R1 -> drop it (the equal preceding letter may sit outside)
    if (
        len(word) >= 2
        and len(word) - 1 >= r1
        and word[-1] not in _DA_VOWELS
        and word[-1] == word[-2]
    ):
        word = word[:-1]
    return word


# The published Snowball Danish stopword list (snowballstem.org
# danish/stop.txt).
SNOWBALL_STOP_DA = frozenset("""
og i jeg det at en den til er som på de med han af for ikke der var mig
sig men et har om vi min havde ham hun nu over da fra du ud sin dem os
op man hans hvor eller hvad skal selv her alle vil blev kunne ind når
være dog noget ville jo deres efter ned skulle denne end dette mit også
under have dig anden hende mine alt meget sit sine vor mod disse hvis
din nogle hos blive mange ad bliver hendes været thi jer sådan
""".split())


# ------------------------------------------------------------------ Dutch
# Snowball Dutch stemmer (snowballstem.org "dutch" algorithm) — the
# stemmer LanguageAnalyzer("nl") selects in the reference via
# lang.stemmer_for_language (reference data: src/whoosh/lang/snowball/
# dutch.py + lang/stopwords.py 'nl'). Independent implementation from the
# PUBLISHED algorithm description (the reference mount is empty — SURVEY
# "Provenance"); parity pinned by hand-executed vectors in
# tests/test_lang_nl.py. Dutch is a standard two-region stemmer (R1
# min-3-adjusted, R2 from the unadjusted R1) with a consonant-marking
# prelude (initial y, y after a vowel, i between vowels go upper-case),
# kk/dd/tt ending undoubling, and a final double-vowel undouble step.

_NL_VOWELS = set("aeiouyè")
_NL_ACCENTS = str.maketrans("äëïöüáéíóú", "aeiouaeiou")
_NL_POSTLUDE = str.maketrans("IY", "iy")


def _nl_prelude(word: str) -> str:
    """Strip umlauts/acutes (è keeps its grave and stays a vowel); mark
    initial y, y after a vowel, and i between vowels as consonants via
    upper-case, left-to-right over the mutating string as published."""
    word = word.translate(_NL_ACCENTS)
    chars = list(word)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _NL_VOWELS:
            chars[i] = "Y"
        elif (
            chars[i] == "i"
            and chars[i - 1] in _NL_VOWELS
            and i + 1 < len(chars)
            and chars[i + 1] in _NL_VOWELS
        ):
            chars[i] = "I"
    return "".join(chars)


def _nl_regions(word: str) -> tuple[int, int]:
    def scan(start: int) -> int:
        for i in range(start, len(word) - 1):
            if word[i] in _NL_VOWELS and word[i + 1] not in _NL_VOWELS:
                return i + 2
        return len(word)

    r1 = scan(0)
    r2 = scan(r1)
    return max(r1, 3), r2


def _nl_undouble(word: str) -> str:
    # "undouble the ending": kk/dd/tt lose the last letter
    if word.endswith(("kk", "dd", "tt")):
        return word[:-1]
    return word


def _nl_en_ok(rem: str) -> bool:
    # valid en-ending: a non-vowel (the marked I/Y count), and not gem
    return (
        len(rem) >= 1
        and rem[-1] not in _NL_VOWELS
        and not rem.endswith("gem")
    )


def _nl_step2(word: str, r1: int) -> tuple[str, bool]:
    # step 2: drop a final e in R1 preceded by a non-vowel, undouble;
    # reports whether an e was actually removed (step 3b's 'bar' gate)
    if (
        word.endswith("e")
        and len(word) - 1 >= r1
        and len(word) >= 2
        and word[-2] not in _NL_VOWELS
    ):
        return _nl_undouble(word[:-1]), True
    return word, False


def stem_nl(word: str) -> str:
    """Snowball-Dutch-stem one lowercase word."""
    word = _nl_prelude(word.lower())
    r1, r2 = _nl_regions(word)

    # ---- step 1: heden -> heid; en/ene after a valid en-ending; s/se
    # after a valid s-ending (a non-vowel other than j)
    suf = _de_longest(word, ("heden", "ene", "en", "se", "s"))
    if suf is not None:
        pos = len(word) - len(suf)
        if suf == "heden":
            if pos >= r1:
                word = word[:pos] + "heid"
        elif suf in ("en", "ene"):
            rem = word[:pos]
            if pos >= r1 and _nl_en_ok(rem):
                word = _nl_undouble(rem)
        else:  # s / se
            rem = word[:pos]
            if (
                pos >= r1
                and rem
                and rem[-1] not in _NL_VOWELS
                and rem[-1] != "j"
            ):
                word = rem

    # ---- step 2
    word, e_found = _nl_step2(word, r1)

    # ---- step 3a: heid in R2 not preceded by c, then a preceding en as
    # in step 1(b)
    if (
        word.endswith("heid")
        and len(word) - 4 >= r2
        and (len(word) < 5 or word[-5] != "c")
    ):
        word = word[:-4]
        if word.endswith("en"):
            pos = len(word) - 2
            rem = word[:pos]
            if pos >= r1 and _nl_en_ok(rem):
                word = _nl_undouble(rem)

    # ---- step 3b: d-suffixes (longest match; a failed side-condition
    # removes nothing — no backtracking)
    suf = _de_longest(word, ("end", "ing", "ig", "lijk", "baar", "bar"))
    if suf in ("end", "ing"):
        pos = len(word) - 3
        if pos >= r2:
            word = word[:pos]
            if (
                word.endswith("ig")
                and len(word) - 2 >= r2
                and (len(word) < 3 or word[-3] != "e")
            ):
                word = word[:-2]
            else:
                word = _nl_undouble(word)
    elif suf == "ig":
        if len(word) - 2 >= r2 and (len(word) < 3 or word[-3] != "e"):
            word = word[:-2]
    elif suf == "lijk":
        if len(word) - 4 >= r2:
            word = word[:-4]
            word, _ = _nl_step2(word, r1)  # "then repeat step 2"
    elif suf == "baar":
        if len(word) - 4 >= r2:
            word = word[:-4]
    elif suf == "bar":
        if len(word) - 3 >= r2 and e_found:
            word = word[:-3]

    # ---- step 4 (undouble vowel): ...C aa/ee/oo/uu D with D a
    # non-vowel other than the marked I -> drop one vowel
    if len(word) >= 4:
        c, v1, v2, d = word[-4], word[-3], word[-2], word[-1]
        if (
            c not in _NL_VOWELS
            and d not in _NL_VOWELS
            and d != "I"
            and v1 == v2
            and v1 in "aeou"
        ):
            word = word[:-2] + d

    # ---- postlude: unmark I/Y
    return word.translate(_NL_POSTLUDE)


# The published Snowball Dutch stopword list (snowballstem.org
# dutch/stop.txt).
SNOWBALL_STOP_NL = frozenset("""
de en van ik te dat die in een hij het niet zijn is was op aan met als
voor had er maar om hem dan zou of wat mijn men dit zo door over ze zich
bij ook tot je mij uit der daar haar naar heb hoe heeft hebben deze u
want nog zal me zij nu ge geen omdat iets worden toch al waren veel meer
doen toen moet ben zonder kan hun dus alles onder ja eens hier wie werd
altijd doch wordt wezen kunnen ons zelf tegen na reeds wil kon niets uw
iemand geweest andere
""".split())


# --------------------------------------------------------------- Romanian
# Snowball Romanian stemmer (snowballstem.org "romanian" algorithm) — the
# stemmer LanguageAnalyzer("ro") selects in the reference via
# lang.stemmer_for_language (reference data: src/whoosh/lang/snowball/
# romanian.py + lang/stopwords.py 'ro'). Independent implementation from
# the PUBLISHED algorithm description (the reference mount is empty —
# SURVEY "Provenance"); parity pinned by hand-executed vectors in
# tests/test_lang_ro.py. Romanian is a Romance-family stemmer: standard
# R1/R2 + the shared RV window, a plural step (0), a repeating
# combining-suffix step (1), a standard-suffix step (2) whose success
# gates the verb step (3, RV-limited like the French/Spanish verb
# tiers), and a final-vowel step (4). The algorithm is defined over the
# cedilla forms ş/ţ; the prelude folds the modern comma-below ș/ț onto
# them, and marks i/u between vowels as consonants via upper-case.

_RO_VOWELS = set("aăâeiîou")

_RO_S0 = (
    "iilor", "aţia", "aţie", "atei", "elor", "iile", "ilor", "aua",
    "ele", "iei", "iua", "ile", "ea", "ii", "ul",
)

# step 1 combining suffixes -> their reduced form (longest match; applied
# repeatedly while a replacement fires in R1)
_RO_S1 = {}
for _sufs, _rep in (
    (("abilitate", "abilitati", "abilităi", "abilităţi"), "abil"),
    (("ibilitate",), "ibil"),
    (("ivitate", "ivitati", "ivităi", "ivităţi"), "iv"),
    (("icitate", "icitati", "icităi", "icităţi", "icator", "icatori",
      "iciv", "iciva", "icive", "icivi", "icivă",
      "ical", "icala", "icale", "icali", "icală"), "ic"),
    (("ativ", "ativa", "ative", "ativi", "ativă", "aţiune",
      "atoare", "ator", "atori", "ătoare", "ător", "ători"), "at"),
    (("itiv", "itiva", "itive", "itivi", "itivă", "iţiune",
      "itoare", "itor", "itori"), "it"),
):
    for _s in _sufs:
        _RO_S1[_s] = _rep

_RO_S2_DELETE = (
    "at", "ata", "ată", "ati", "ate",
    "ut", "uta", "ută", "uti", "ute",
    "ât", "âta", "âtă", "âti", "âte",
    "ic", "ica", "ice", "ici", "ică",
    "abil", "abila", "abile", "abili", "abilă",
    "ibil", "ibila", "ibile", "ibili", "ibilă",
    "oasa", "oasă", "oase", "os", "osi", "oşi",
    "ant", "anta", "ante", "anti", "antă",
    "ator", "atori",
    "itate", "itati", "ităi", "ităţi",
    "iv", "iva", "ive", "ivi", "ivă",
)
_RO_S2_IST = ("ism", "isme", "ist", "ista", "iste", "isti", "istă", "işti")
_RO_S2_ALL = _RO_S2_DELETE + _RO_S2_IST + ("iune", "iuni")

# step 3 verb suffixes. Group A deletes only when preceded INSIDE RV by a
# non-vowel or by 'u' (setlimit semantics: a preceding letter outside RV
# fails the test); group B deletes unconditionally. One longest-match
# among over A ∪ B — a failed A-condition removes nothing.
_RO_VERB_A = (
    "are", "ere", "ire", "âre",
    "ind", "ând", "indu", "ându",
    "eze", "ează", "ez", "ezi",
    "ească", "esc", "eşti", "eşte", "ăsc", "ăşti", "ăşte",
    "am", "ai", "au",
    "eam", "eai", "ea", "eaţi", "eau",
    "iam", "iai", "ia", "iaţi", "iau",
    "ui", "aşi", "arăm", "arăţi", "ară",
    "uşi", "urăm", "urăţi", "ură",
    "işi", "irăm", "irăţi", "iră",
    "âi", "âşi", "ârăm", "ârăţi", "âră",
    "asem", "aseşi", "ase", "aserăm", "aserăţi", "aseră",
    "isem", "iseşi", "ise", "iserăm", "iserăţi", "iseră",
    "âsem", "âseşi", "âse", "âserăm", "âserăţi", "âseră",
    "usem", "useşi", "use", "userăm", "userăţi", "useră",
)
_RO_VERB_B = (
    "ăm", "aţi", "em", "eţi", "im", "iţi", "âm", "âţi",
    "seşi", "serăm", "serăţi", "seră", "sei", "se",
    "sesem", "seseşi", "sese", "seserăm", "seserăţi", "seseră",
)

_RO_POSTLUDE = str.maketrans("IU", "iu")


def _ro_prelude(word: str) -> str:
    word = word.replace("ș", "ş").replace("ț", "ţ")
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if (
            chars[i] in "iu"
            and chars[i - 1] in _RO_VOWELS
            and chars[i + 1] in _RO_VOWELS
        ):
            chars[i] = chars[i].upper()
    return "".join(chars)


def _ro_regions(word: str) -> tuple[int, int, int]:
    """Standard R1/R2 + the shared Romance RV definition (after the next
    vowel when letter 2 is a consonant; after the next consonant when
    letters 1-2 are both vowels; else after the third letter)."""

    def scan(start: int) -> int:
        for i in range(start, len(word) - 1):
            if word[i] in _RO_VOWELS and word[i + 1] not in _RO_VOWELS:
                return i + 2
        return len(word)

    r1 = scan(0)
    r2 = scan(r1)
    n = len(word)
    if n < 3:
        rv = n
    elif word[1] not in _RO_VOWELS:
        rv = n
        for i in range(2, n):
            if word[i] in _RO_VOWELS:
                rv = i + 1
                break
    elif word[0] in _RO_VOWELS and word[1] in _RO_VOWELS:
        rv = n
        for i in range(2, n):
            if word[i] not in _RO_VOWELS:
                rv = i + 1
                break
    else:
        rv = 3
    return r1, r2, rv


def stem_ro(word: str) -> str:
    """Snowball-Romanian-stem one lowercase word."""
    word = _ro_prelude(word.lower())
    r1, r2, rv = _ro_regions(word)

    # ---- step 0: plurals and other simplifications (in R1)
    suf = _de_longest(word, _RO_S0)
    if suf is not None:
        pos = len(word) - len(suf)
        if pos >= r1:
            if suf == "ul":
                word = word[:pos]
            elif suf == "aua":
                word = word[:pos] + "a"
            elif suf in ("ea", "ele", "elor"):
                word = word[:pos] + "e"
            elif suf in ("ii", "iua", "iei", "iile", "iilor", "ilor"):
                word = word[:pos] + "i"
            elif suf == "ile":
                if not word[:pos].endswith("ab"):
                    word = word[:pos] + "i"
            elif suf == "atei":
                word = word[:pos] + "at"
            else:  # aţie / aţia
                word = word[:pos] + "aţi"

    # ---- step 1: combining suffixes, repeated while one fires (in R1);
    # a success counts as "standard suffix removed" for step 3's gate
    removed = False
    while True:
        suf = _de_longest(word, tuple(_RO_S1))
        if suf is None or len(word) - len(suf) < r1:
            break
        word = word[: len(word) - len(suf)] + _RO_S1[suf]
        removed = True

    # ---- step 2: standard suffixes (in R2)
    suf = _de_longest(word, _RO_S2_ALL)
    if suf is not None:
        pos = len(word) - len(suf)
        if pos >= r2:
            if suf in ("iune", "iuni"):
                # delete only when preceded by ţ, which becomes t
                if pos >= 1 and word[pos - 1] == "ţ":
                    word = word[: pos - 1] + "t"
                    removed = True
            elif suf in _RO_S2_IST:
                word = word[:pos] + "ist"
                removed = True
            else:
                word = word[:pos]
                removed = True

    # ---- step 3: verb suffixes (RV-limited), only if steps 1-2 removed
    # nothing
    if not removed:
        suf = _de_longest(word, _RO_VERB_A + _RO_VERB_B)
        if suf is not None:
            pos = len(word) - len(suf)
            if pos >= rv:
                if suf in _RO_VERB_B:
                    word = word[:pos]
                elif pos - 1 >= rv and (
                    word[pos - 1] not in _RO_VOWELS
                    or word[pos - 1] == "u"
                ):
                    word = word[:pos]

    # ---- step 4: final vowel (in RV)
    suf = _de_longest(word, ("a", "e", "i", "ie", "ă"))
    if suf is not None and len(word) - len(suf) >= rv:
        word = word[: len(word) - len(suf)]

    return word.translate(_RO_POSTLUDE)


# Romanian stopword list — the reference bundles stopword data per
# language (src/whoosh/lang/stopwords.py 'ro'); with the mount empty this
# is the standard Romanian function-word list (articles, pronouns,
# prepositions, conjunctions, auxiliaries) in its published cedilla form.
SNOWBALL_STOP_RO = frozenset("""
şi în de la cu pe un o este sunt a al ale ai lui ei lor că să nu se ce
care mai dar din ca pentru fi fost era erau fie dacă după când unde cum
prin despre între fără până peste sub spre asupra acest această aceste
acestor acel acea acei acele el ea ele noi voi eu tu îi le îl ne vă mă
te am ai are avem aveţi au avut va vor fiind atunci acum aici acolo
toate toţi tot toată foarte doar numai însă deci astfel ori sau nici
chiar către încă orice fiecare unei unui unor celor celui alte alt alta
altă alţi câte câţi cât câtă atât mult multe mulţi puţin aceasta acesta
acestea acestuia acesteia asemenea
""".split())


# --------------------------------------------------------------- Hungarian
# Snowball Hungarian stemmer (snowballstem.org "hungarian" algorithm) —
# the stemmer LanguageAnalyzer("hu") selects in the reference via
# lang.stemmer_for_language (reference data: src/whoosh/lang/snowball/
# hungarian.py + lang/stopwords.py 'hu'). Independent implementation
# from the PUBLISHED algorithm description (the reference mount is empty
# — SURVEY "Provenance"); parity pinned by hand-executed vectors in
# tests/test_lang_hu.py. Hungarian is a single-region stemmer with a
# digraph-aware R1 (cs/dz/dzs/gy/ly/ny/sz/ty/zs count as one consonant
# when marking the region), double-consonant tests with digraph doubles
# (ccs/ggy/lly/nny/ssz/tty/zzs), and nine ordered suffix-class steps
# (instrumental, case, special case, other case, factive, owned,
# singular owner, plural owner, plural), each a longest-match among
# limited to R1.

_HU_VOWELS = set("aáeéiíoóöőuúüű")
_HU_DIGRAPHS = ("dzs", "cs", "dz", "gy", "ly", "ny", "sz", "ty", "zs")
# doubles, longest-first so ccs/ssz-style digraph doubles win over cc/ss
_HU_DOUBLES = (
    "ccs", "ggy", "lly", "nny", "ssz", "tty", "zzs",
    "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn",
    "pp", "rr", "ss", "tt", "vv", "zz",
)

_HU_CASE = (
    "ban", "ben", "ba", "be", "ra", "re", "nak", "nek", "val", "vel",
    "tól", "től", "ról", "ről", "ból", "ből", "hoz", "hez", "höz",
    "nál", "nél", "ig", "at", "et", "ot", "öt", "ért", "képp", "képpen",
    "kor", "ul", "ül", "vá", "vé", "onként", "enként", "anként",
    "ként", "en", "on", "an", "ön", "n", "t",
)

_HU_OWNED = {
    "oké": "", "öké": "", "aké": "", "eké": "", "ké": "", "éi": "",
    "é": "", "áké": "a", "áéi": "a", "éké": "e", "ééi": "e", "éé": "e",
}

_HU_SING_OWNER = {
    "ünk": "", "unk": "", "ánk": "a", "énk": "e", "nk": "",
    "ájuk": "a", "éjük": "e", "juk": "", "jük": "", "uk": "", "ük": "",
    "ém": "e", "ám": "a", "em": "", "om": "", "am": "", "m": "",
    "éd": "e", "ád": "a", "ed": "", "od": "", "ad": "", "d": "",
    "ja": "", "je": "", "á": "a", "é": "e", "a": "", "e": "", "o": "",
}

_HU_PLUR_OWNER = {
    "áim": "a", "éim": "e", "jaim": "", "jeim": "", "aim": "", "eim": "",
    "im": "",
    "áid": "a", "éid": "e", "jaid": "", "jeid": "", "aid": "", "eid": "",
    "id": "",
    "ái": "a", "jai": "", "jei": "", "ai": "", "ei": "", "i": "",
    "áink": "a", "éink": "e", "jaink": "", "jeink": "", "aink": "",
    "eink": "", "ink": "",
    "áitok": "a", "éitek": "e", "jaitok": "", "jeitek": "", "aitok": "",
    "eitek": "", "itek": "",
    "áik": "a", "éik": "e", "jaik": "", "jeik": "", "aik": "", "eik": "",
    "ik": "",
}

_HU_PLURAL = {"ák": "a", "ék": "e", "ök": "", "ok": "", "ek": "",
              "ak": "", "k": ""}


def _hu_r1(word: str) -> int:
    """R1: after the first consonant-or-digraph following the start when
    the word begins with a vowel (the digraph is one unit), else after
    the first vowel."""
    n = len(word)
    if not word:
        return 0
    if word[0] in _HU_VOWELS:
        for i in range(1, n):
            if word[i] not in _HU_VOWELS:
                for d in _HU_DIGRAPHS:
                    if word.startswith(d, i):
                        return i + len(d)
                return i + 1
        return n
    for i in range(1, n):
        if word[i] in _HU_VOWELS:
            return i + 1
    return n


def _hu_ends_double(word: str) -> str | None:
    for d in _HU_DOUBLES:
        if word.endswith(d):
            return d
    return None


def _hu_undouble(word: str) -> str:
    """Remove one member of a final double consonant: ccs -> cs,
    ssz -> sz, bb -> b, ..."""
    d = _hu_ends_double(word)
    if d is None:
        return word
    if len(d) == 3:
        return word[:-3] + d[1:]
    return word[:-1]


def _hu_map_step(word: str, r1: int, table: dict) -> str:
    """One longest-match among over ``table`` limited to R1; the value is
    the replacement ('' = delete). A match before R1 removes nothing (no
    backtracking)."""
    suf = _de_longest(word, tuple(table))
    if suf is not None and len(word) - len(suf) >= r1:
        return word[: len(word) - len(suf)] + table[suf]
    return word


def stem_hu(word: str) -> str:
    """Snowball-Hungarian-stem one lowercase word."""
    word = word.lower()
    r1 = _hu_r1(word)

    # ---- step 1: instrumental case — al/el in R1 preceded by a double
    # consonant; delete and undouble (könyvvel -> könyv)
    suf = _de_longest(word, ("al", "el"))
    if suf is not None:
        pos = len(word) - 2
        if pos >= r1 and _hu_ends_double(word[:pos]):
            word = _hu_undouble(word[:pos])

    # ---- step 2: frequent cases; after deletion a final á/é is
    # shortened to a/e
    suf = _de_longest(word, _HU_CASE)
    if suf is not None and len(word) - len(suf) >= r1:
        word = word[: len(word) - len(suf)]
        if word.endswith("á"):
            word = word[:-1] + "a"
        elif word.endswith("é"):
            word = word[:-1] + "e"

    # ---- step 3: special cases
    word = _hu_map_step(word, r1, {"ánként": "a", "án": "a", "én": "e"})

    # ---- step 4: other cases
    word = _hu_map_step(
        word, r1,
        {"astul": "", "estül": "", "stul": "", "stül": "",
         "ástul": "a", "éstül": "e"})

    # ---- step 5: factive case — á/é in R1 preceded by a double
    # consonant; delete and undouble
    if word and word[-1] in "áé":
        pos = len(word) - 1
        if pos >= r1 and _hu_ends_double(word[:pos]):
            word = _hu_undouble(word[:pos])

    # ---- step 6: owned (-é "that of", -éi plural)
    word = _hu_map_step(word, r1, _HU_OWNED)

    # ---- step 7: singular owner suffixes
    word = _hu_map_step(word, r1, _HU_SING_OWNER)

    # ---- step 8: plural owner suffixes
    word = _hu_map_step(word, r1, _HU_PLUR_OWNER)

    # ---- step 9: plural
    word = _hu_map_step(word, r1, _HU_PLURAL)

    return word


# Hungarian stopword list — the reference bundles stopword data per
# language (src/whoosh/lang/stopwords.py 'hu'); standard Hungarian
# function words (articles, pronouns, conjunctions, auxiliaries).
SNOWBALL_STOP_HU = frozenset("""
a az és hogy nem is de van egy ez volt már meg csak mint el még ki mi
ha vagy te ők mert be azt aki így majd ő én őt neki vele nekem itt ott
úgy ezt arra erre abban ebben annak ennek attól ettől arról erről ahhoz
ehhez azzal ezzel után alatt előtt között ellen nélkül által olyan
ilyen mely amely amelyek aki akik ami amik mikor hol hova honnan miért
hogyan milyen mennyi sem se pedig hanem illetve valamint tehát ugyanis
azonban viszont bár noha hiszen amikor ahol ahogy amint míg mivel ezért
azért akkor most mindig soha talán éppen szinte nagyon inkább ismét
újra együtt át rá le fel ide oda vissza volt voltak lesz lenne lehet
kell kellett minden mindenki semmi valami néhány több kevés sok
""".split())


# ----------------------------------------------------------------- Finnish
# Snowball Finnish stemmer (snowballstem.org "finnish" algorithm) — the
# stemmer LanguageAnalyzer("fi") selects in the reference via
# lang.stemmer_for_language (reference data: src/whoosh/lang/snowball/
# finnish.py + lang/stopwords.py 'fi'). Independent implementation from
# the PUBLISHED algorithm description (the reference mount is empty —
# SURVEY "Provenance"); parity pinned by hand-executed vectors in
# tests/test_lang_fi.py. Finnish is a two-region agglutinative stemmer:
# ordered particle / possessive / case / comparative steps, an i- or
# t-plural step selected by whether a CASE ending was removed, and a
# four-rule tidy pass plus a final double-consonant undouble. Every
# look-behind honours Snowball's setlimit-to-R1 window: a condition
# character that sits before R1 is unreadable and fails its test (so a
# `not 'k'` look-behind SUCCEEDS at the window edge).

_FI_VOWELS = set("aeiouyäö")
_FI_V2 = set("aeiouäö")            # restricted vowel (no y), the Vi test
_FI_AEI = set("aäei")
_FI_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")
_FI_PARTICLE_END = _FI_VOWELS | {"n", "t"}

_FI_PARTICLES = ("kin", "kaan", "kään", "ko", "kö", "han", "hän",
                 "pa", "pä", "sti")
_FI_POSS = ("si", "ni", "nsa", "nsä", "mme", "nne", "an", "än", "en")
_FI_HXN = {"han": "a", "hen": "e", "hin": "i", "hon": "o", "hun": "u",
           "hyn": "y", "hän": "ä", "hön": "ö"}
_FI_CASE_PLAIN = ("ta", "tä", "ssa", "ssä", "sta", "stä", "lla", "llä",
                  "lta", "ltä", "lle", "na", "nä", "ksi", "ine")
_FI_CASES = (tuple(_FI_HXN) + ("siin", "den", "tten", "seen", "a", "ä",
                               "tta", "ttä", "n") + _FI_CASE_PLAIN)
_FI_OTHER = ("mpi", "mpa", "mpä", "mmi", "mma", "mmä",
             "impi", "impa", "impä", "immi", "imma", "immä",
             "eja", "ejä")


def _fi_regions(word: str) -> tuple[int, int]:
    def scan(start: int) -> int:
        for i in range(start, len(word) - 1):
            if word[i] in _FI_VOWELS and word[i + 1] not in _FI_VOWELS:
                return i + 2
        return len(word)

    r1 = scan(0)
    return r1, scan(r1)


def _fi_ends_long(word: str, r1: int) -> bool:
    # a final long vowel, readable inside the R1 window
    return (len(word) >= 2 and len(word) - 2 >= r1
            and word[-2:] in _FI_LONG)


def stem_fi(word: str) -> str:
    """Snowball-Finnish-stem one lowercase word."""
    word = word.lower()
    r1, r2 = _fi_regions(word)

    # ---- step 1: particles etc. (window = R1)
    suf = _de_longest(word, _FI_PARTICLES)
    if suf is not None:
        pos = len(word) - len(suf)
        if pos >= r1:
            if suf == "sti":
                if pos >= r2:
                    word = word[:pos]
            elif pos - 1 >= r1 and word[pos - 1] in _FI_PARTICLE_END:
                word = word[:pos]

    # ---- step 2: possessives (window = R1)
    suf = _de_longest(word, _FI_POSS)
    if suf is not None:
        pos = len(word) - len(suf)
        if pos >= r1:
            if suf == "si":
                # not preceded by k — an unreadable look-behind counts
                # as "not k" success
                if pos - 1 < r1 or word[pos - 1] != "k":
                    word = word[:pos]
            elif suf == "ni":
                word = word[:pos]
                if word.endswith("kse") and len(word) - 3 >= 0:
                    word = word[:-1] + "i"
            elif suf in ("nsa", "nsä", "mme", "nne"):
                word = word[:pos]
            elif suf == "an":
                if any(word.endswith(p, r1 if pos - len(p) < r1 else 0,
                                     pos) and pos - len(p) >= r1
                       for p in ("ta", "ssa", "sta", "lla", "lta", "na")):
                    word = word[:pos]
            elif suf == "än":
                if any(word.endswith(p, 0, pos) and pos - len(p) >= r1
                       for p in ("tä", "ssä", "stä", "llä", "ltä", "nä")):
                    word = word[:pos]
            else:  # en
                if any(word.endswith(p, 0, pos) and pos - len(p) >= r1
                       for p in ("lle", "ine")):
                    word = word[:pos]

    # ---- step 3: cases (window = R1); success selects the i-plural
    ending_removed = False
    suf = _de_longest(word, _FI_CASES)
    if suf is not None:
        pos = len(word) - len(suf)
        if pos >= r1:
            if suf in _FI_HXN:
                # illative -hVn where V copies the preceding vowel
                if pos - 1 >= r1 and word[pos - 1] == _FI_HXN[suf]:
                    word = word[:pos]
                    ending_removed = True
            elif suf in ("siin", "den", "tten"):
                # preceded by Vi (restricted vowel + i)
                if (pos - 2 >= r1 and word[pos - 1] == "i"
                        and word[pos - 2] in _FI_V2):
                    word = word[:pos]
                    ending_removed = True
            elif suf == "seen":
                if pos - 2 >= r1 and word[pos - 2:pos] in _FI_LONG:
                    word = word[:pos]
                    ending_removed = True
            elif suf in ("a", "ä"):
                # preceded by consonant + vowel
                if (pos - 2 >= r1 and word[pos - 1] in _FI_VOWELS
                        and word[pos - 2] not in _FI_VOWELS):
                    word = word[:pos]
                    ending_removed = True
            elif suf in ("tta", "ttä"):
                if pos - 1 >= r1 and word[pos - 1] == "e":
                    word = word[:pos]
                    ending_removed = True
            elif suf == "n":
                word = word[:pos]
                ending_removed = True
                if _fi_ends_long(word, r1) or (
                        len(word) - 2 >= r1 and word.endswith("ie")):
                    word = word[:-1]
            else:
                word = word[:pos]
                ending_removed = True

    # ---- step 4: other endings (comparatives etc., window = R2)
    suf = _de_longest(word, _FI_OTHER)
    if suf is not None:
        pos = len(word) - len(suf)
        if pos >= r2:
            if suf in ("mpi", "mpa", "mpä", "mmi", "mma", "mmä"):
                if not word.endswith("po", 0, pos):
                    word = word[:pos]
            else:
                word = word[:pos]

    # ---- step 5: plurals — i-plural when a case ending was removed,
    # else the t-plural (which may expose a superlative mma/imma in R2)
    if ending_removed:
        if word and word[-1] in "ij" and len(word) - 1 >= r1:
            word = word[:-1]
    else:
        if (word.endswith("t") and len(word) - 1 >= r1
                and len(word) - 2 >= r1 and word[-2] in _FI_VOWELS):
            word = word[:-1]
            suf = _de_longest(word, ("imma", "mma"))
            if suf is not None and len(word) - len(suf) >= r2:
                if suf == "imma" or not word.endswith(
                        "po", 0, len(word) - 3):
                    word = word[: len(word) - len(suf)]

    # ---- step 6: tidying (four R1-window rules, then the global
    # double-consonant undouble)
    if _fi_ends_long(word, r1):
        word = word[:-1]
    if (word and word[-1] in _FI_AEI and len(word) - 1 >= r1
            and len(word) - 2 >= r1 and word[-2] not in _FI_VOWELS):
        word = word[:-1]
    if (word.endswith("j") and len(word) - 1 >= r1
            and len(word) - 2 >= r1 and word[-2] in "ou"):
        word = word[:-1]
    if (word.endswith("o") and len(word) - 1 >= r1
            and len(word) - 2 >= r1 and word[-2] == "j"):
        word = word[:-1]
    # final: a double consonant followed by zero or more vowels loses
    # its last consonant (eläkk -> eläk, aatonaatto -> aatonaato)
    j = len(word) - 1
    while j >= 0 and word[j] in _FI_VOWELS:
        j -= 1
    if j >= 1 and word[j] not in _FI_VOWELS and word[j] == word[j - 1]:
        word = word[:j] + word[j + 1:]

    return word


# The published Snowball Finnish stopword list (snowballstem.org
# finnish/stop.txt) — forms of olla/ei, personal and demonstrative
# pronoun paradigms, and the core conjunctions.
SNOWBALL_STOP_FI = frozenset("""
olla olen olet on olemme olette ovat ole oli olisi olisit olisin
olisimme olisitte olisivat olit olin olimme olitte olivat ollut olleet
en et ei emme ette eivät minä minun minut minua minussa minusta minuun
minulla minulta minulle sinä sinun sinut sinua sinussa sinusta sinuun
sinulla sinulta sinulle hän hänen hänet häntä hänessä hänestä häneen
hänellä häneltä hänelle me meidän meidät meitä meissä meistä meihin
meillä meiltä meille te teidän teidät teitä teissä teistä teihin
teillä teiltä teille he heidän heidät heitä heissä heistä heihin
heillä heiltä heille tämä tämän tätä tässä tästä tähän tällä tältä
tälle tänä täksi tuo tuon tuota tuossa tuosta tuohon tuolla tuolta
tuolle tuona tuoksi se sen sitä siinä siitä siihen sillä siltä sille
sinä siksi nämä näiden näitä näissä näistä näihin näillä näiltä
näille näinä näiksi nuo noiden noita noissa noista noihin noilla
noilta noille noina noiksi ne niiden niitä niissä niistä niihin
niillä niiltä niille niinä niiksi kuka kenen kenet ketä kenessä
kenestä keneen kenellä keneltä kenelle kenenä keneksi ketkä keitä
keissä keistä keihin keillä keiltä keille keinä keiksi mikä minkä
mitä missä mistä mihin millä miltä mille minä miksi kuin ja että
joka kun niin sekä mutta vaan tai vai jos koska kuten itse juuri
myös vielä vain jo nyt sitten tässä siellä täällä
""".split())


# ----------------------------------------------------------------- Turkish
# Turkish stopword list — the reference bundles Turkish STOPWORDS but no
# Turkish stemmer (src/whoosh/lang/stopwords.py 'tr'; there is no
# snowball Turkish class in lang/snowball/), and its LanguageAnalyzer
# silently composes tokenize|lowercase|StopFilter only when
# stemmer_for_language raises (analysis/analyzers.py::LanguageAnalyzer's
# try/except NoStemmer). LANGUAGE("tr") mirrors that: stoplist, no stem.
STOP_TR = frozenset("""
acaba ama ancak artık asla aslında az bana bazen bazı bazıları belki
ben beni benim beş bile bir birçok biri birkaç birşey biz bize bizi
bizim böyle böylece bu buna bunda bundan bunlar bunları bunu bunun
burada bütün çok çünkü da daha de değil demek diğer diye dolayı dört
elbette en fakat falan felan gibi hangi hani hatta hem henüz hep hepsi
her herkes hiç hiçbir için içinde iki ile ilgili ise işte kaç kadar
karşı kendi kendine kendini ki kim kime kimi kimin kimse madem mi mı
mu mü nasıl ne neden nedir nerde nerede nereye niçin niye on ona ondan
onlar onlara onlardan onları onların onu onun orada oysa öyle pek rağmen
sana sen senden seni senin siz sizden sizi sizin son sonra şayet şey
şimdi şöyle şu şuna şunları şunu tabi tamam tüm tümü üç üzere var ve
veya ya yani yerine yine yoksa zaten zira
""".split())


# ------------------------------------------------------------------ Arabic
# ISRI Arabic stemmer (Taghva, Elkhoury & Coombs 2005, "Arabic Stemming
# Without A Root Dictionary") — the stemmer the reference's
# lang.stemmer_for_language("ar") selects (reference data:
# src/whoosh/lang/isri.py + lang/stopwords.py 'ar'). Independent
# implementation from the PUBLISHED paper's rule tables (the reference
# mount is empty — SURVEY "Provenance"); parity pinned by hand-executed
# vectors in tests/test_lang_ar.py. ISRI is a root-extraction stemmer:
# diacritic normalization, length-3/2 prefix and suffix classes, the
# connective-waw rule, initial-hamza normalization, then length-driven
# pattern matching (awzan) that locates the 3- or 4-letter root inside
# 4/5/6/7-letter words, falling back to single-letter affix removal.

# affix classes (paper Tables 1-3)
_AR_P3 = ("كال", "بال",
          "ولل", "وال")     # كال بال ولل وال
_AR_P2 = ("ال", "لل")                  # ال لل
_AR_P1 = tuple("لبفسويتنا")
_AR_S3 = ("تمل", "همل",
          "تان", "تين",
          "كمل")                             # تمل همل تان تين كمل
_AR_S2 = ("ون", "ات", "ان", "ين",
          "تن", "كم", "هن", "نا",
          "يا", "ها", "تم", "كن",
          "ني", "وا", "ما", "هم")
_AR_S1 = tuple("ةهيكتان")

# pattern tables: allowed non-root letters by position for 4-letter words
# (pr4) and for the 3-letter-root patterns of 5-letter words (pr53)
_AR_PR4 = {0: "م", 1: "ا", 2: "اوي", 3: "ة"}
_AR_PR53 = {0: "ات", 1: "ايو",
            2: "اتم", 3: "ميت",
            4: "مت", 5: "او", 6: "ام"}

import re as _re

_AR_SHORT_VOWELS = _re.compile("[ً-ْ]")
_AR_INITIAL_HAMZA = _re.compile("^[آأإ]")

# high-frequency words the ISRI pass returns unstemmed (the paper keeps a
# small function-word exception list; this is its common core)
_AR_STOP = frozenset((
    "يكون", "وليس",
    "وكان", "كذلك",
    "التي", "وبين",
    "عليها", "الذي",
    "وكانت", "ولكن",
    "والتي", "تكون",
    "اليوم", "اللذين",
    "عليه", "كانت",
    "لذلك", "أمام",
    "هناك", "منها",
    "الذين", "والذي",
))


def _ar_suf1(word: str) -> str:
    if word and word[-1] in _AR_S1:
        return word[:-1]
    return word


def _ar_pre1(word: str) -> str:
    if word and word[0] in _AR_P1:
        return word[1:]
    return word


def _ar_pro_w4(word: str) -> str:
    # 4-letter word against the 3-root patterns مفعل فاعل فعال/فعول/فعيل فعلة
    if word[0] in _AR_PR4[0]:
        return word[1:]
    if word[1] in _AR_PR4[1]:
        return word[0] + word[2:]
    if word[2] in _AR_PR4[2]:
        return word[:2] + word[3]
    if word[3] in _AR_PR4[3]:
        return word[:-1]
    word = _ar_suf1(word)
    if len(word) == 4:
        word = _ar_pre1(word)
    return word


def _ar_pro_w53(word: str) -> str:
    # 5-letter word against the 3-root patterns (افتعل مفعول مفعلة مفتعل
    # مفاعل فعالة انفعل افعال فعلان تفعيل فوعول فواعل فعائل فاعلة فعالي)
    if word[2] in _AR_PR53[0] and word[0] == "ا":
        return word[1] + word[3:]
    if word[3] in _AR_PR53[1] and word[0] == "م":
        return word[1:3] + word[4]
    if word[0] in _AR_PR53[2] and word[4] == "ة":
        return word[1:4]
    if word[0] in _AR_PR53[3] and word[2] == "ت":
        return word[1] + word[3:]
    if word[0] in _AR_PR53[4] and word[2] == "ا":
        return word[1] + word[3:]
    if word[2] in _AR_PR53[5] and word[4] == "ة":
        return word[:2] + word[3]
    if word[0] in _AR_PR53[6] and word[1] == "ن":
        return word[2:]
    if word[3] == "ا" and word[0] == "ا":
        return word[1:3] + word[4]
    if word[4] == "ن" and word[3] == "ا":
        return word[:3]
    if word[3] == "ي" and word[0] == "ت":
        return word[1:3] + word[4]
    if word[3] == "و" and word[1] == "و":
        return word[0] + word[2] + word[4]
    if word[2] == "ا" and word[1] == "و":
        return word[0] + word[3:]
    if word[3] == "ئ" and word[2] == "ا":
        return word[:2] + word[4]
    if word[4] == "ة" and word[1] == "ا":
        return word[0] + word[2:4]
    if word[4] == "ي" and word[2] == "ا":
        return word[:2] + word[3]
    word = _ar_suf1(word)
    if len(word) == 5:
        word = _ar_pre1(word)
    return word


def _ar_pro_w54(word: str) -> str:
    # 5-letter word against the 4-root patterns (تفعلل فعللة فعالل)
    if word[0] in _AR_PR53[2]:
        return word[1:]
    if word[4] == "ة":
        return word[:4]
    if word[2] == "ا":
        return word[:2] + word[3:]
    return word


def _ar_end_w5(word: str) -> str:
    if len(word) == 4:
        return _ar_pro_w4(word)
    if len(word) == 5:
        return _ar_pro_w54(word)
    return word


def _ar_pro_w6(word: str) -> str:
    # 6-letter word against the 3-root patterns (استفعل/مستفعل مفعالة
    # افتعال افعوعل تفاعيل)
    if word.startswith(("است", "مست")):
        return word[3:]
    if (word[0] == "م" and word[3] == "ا"
            and word[5] == "ة"):
        return word[1:3] + word[4]
    if (word[0] == "ا" and word[2] == "ت"
            and word[4] == "ا"):
        return word[1] + word[3] + word[5]
    if (word[0] == "ا" and word[3] == "و"
            and word[2] == word[4]):
        return word[1] + word[4:]
    if (word[0] == "ت" and word[2] == "ا"
            and word[4] == "ي"):
        return word[1] + word[3] + word[5]
    word = _ar_suf1(word)
    if len(word) == 6:
        word = _ar_pre1(word)
    return word


def _ar_pro_w64(word: str) -> str:
    # 6-letter word against the 4-root patterns (افعلال متفعلل)
    if word[0] == "ا" and word[4] == "ا":
        return word[1:4] + word[5]
    if word.startswith("مت"):
        return word[2:]
    return word


def _ar_end_w6(word: str) -> str:
    if len(word) == 5:
        word = _ar_pro_w53(word)
        return _ar_end_w5(word)
    if len(word) == 6:
        return _ar_pro_w64(word)
    return word


def stem_ar(word: str) -> str:
    """ISRI-stem one Arabic token (no-op for non-Arabic input)."""
    word = _AR_SHORT_VOWELS.sub("", word)
    if word in _AR_STOP:
        return word
    # length-3 then length-2 prefixes (the longer class needs the longer
    # remainder guard)
    if len(word) >= 6 and word.startswith(_AR_P3):
        word = word[3:]
    elif len(word) >= 5 and word.startswith(_AR_P2):
        word = word[2:]
    # length-3 then length-2 suffixes
    if len(word) >= 6 and word.endswith(_AR_S3):
        word = word[:-3]
    elif len(word) >= 5 and word.endswith(_AR_S2):
        word = word[:-2]
    # connective waw: an initial وو loses one و
    if len(word) >= 4 and word.startswith("وو"):
        word = word[1:]
    # initial hamza forms normalize to bare alif
    word = _AR_INITIAL_HAMZA.sub("ا", word)

    n = len(word)
    if n == 4:
        word = _ar_pro_w4(word)
    elif n == 5:
        word = _ar_pro_w53(word)
        word = _ar_end_w5(word)
    elif n == 6:
        word = _ar_pro_w6(word)
        word = _ar_end_w6(word)
    elif n == 7:
        word = _ar_suf1(word)
        if len(word) == 7:
            word = _ar_pre1(word)
        if len(word) == 6:
            word = _ar_pro_w6(word)
            word = _ar_end_w6(word)
    return word


# Arabic stopword list — the reference bundles stopword data per language
# (src/whoosh/lang/stopwords.py 'ar'); standard Arabic function words.
STOP_AR = frozenset("""
من في على أن إلى عن مع هذا هذه ذلك تلك التي الذي الذين ما لا لم لن لو
كان كانت يكون تكون هو هي هم هن أنا نحن أنت كما لكن بل قد كل بعض غير
بين عند عندما حتى إذا أو ثم منذ حيث هناك هنا أي أيضا فقط بعد قبل فوق
تحت أمام خلف ضد نحو عبر خلال دون سوف ليس ليست إن لأن كيف متى أين لماذا
الى اذا انه انها وهو وهي وقد وما ولا وان ومن وكان فيه فيها عليه عليها
منه منها اليه اليها به بها له لها لهم اننا انني
""".split())
