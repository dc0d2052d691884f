"""Language analyzer chains, batch 2 — swedish, danish, finnish, hungarian,
czech, greek, turkish, arabic, indonesian, persian (the reference registers
36 language analyzers, ``modules/analysis-common/.../CommonAnalysisPlugin
.java:179-219``; with this batch we cover 23).

Chain shape matches ``analysis/lang.py``: standard (UAX#29) tokens →
per-token normalize → lowercase → stop (position gaps) → stem. All stemmers
are from-scratch implementations of PUBLIC algorithm families:

  swedish / danish   the Snowball Scandinavian algorithms (Porter's Snowball
                     site; Lucene SwedishStemmer/DanishStemmer semantics):
                     R1 suffix strip + s-ending letter class + ending cleanup
  finnish / hungarian / czech
                     the light-stemmer family (Jacques Savoy, ACM SAC 2006;
                     Dolamic & Savoy, "Stemming Approaches for East European
                     Languages", CLEF 2007 — the sources of the reference's
                     ``*LightStemFilter`` / CzechStemmer): longest-first case/
                     plural suffix strip with a minimum-stem guard, no
                     palatalization table (documented simplification)
  greek              GreekLowerCaseFilter semantics (final sigma, tonos
                     fold) + a light ending strip of the GreekStemmer family
  turkish            apostrophe cut (TurkishAnalyzer's ApostropheFilter) +
                     Turkish-aware lowercase (dotted/dotless i,
                     TurkishLowerCaseFilter) + light possessive/case strip
  arabic             ArabicNormalizationFilter + the Larkey "light10"
                     stemmer (Larkey, Ballesteros & Connell, "Improving
                     Stemming for Arabic Information Retrieval", SIGIR 2002
                     — what Lucene's ArabicStemmer implements)
  indonesian         affix-strip subset of the Tala / Asian stemmer family
                     (Lucene IndonesianStemmer semantics): particles,
                     possessives, one derivational prefix/suffix pass
  persian            normalization ONLY (farsi yeh/keheh unification,
                     diacritic strip) + stopwords — the reference's
                     PersianAnalyzer ships no stemmer

Stopword sets are compact subsets of the public Snowball / Lucene lists.
Golden fixtures in ``tests/test_lang_analyzers.py`` pin exact semantics;
cross-inflection conflation is the tested contract."""

from __future__ import annotations

from elasticsearch_ray.analysis.analyzers import register
from elasticsearch_ray.analysis.lang import _StemAnalyzer

# --------------------------------------------------------------- stopwords
SWEDISH_STOP = frozenset(
    """och det att i en jag hon som han på den med var sig för så till är
    men ett om hade de av icke mig du henne då sin nu har inte hans honom
    skulle hennes där min man ej vid kunde något från ut när efter upp vi
    dem vara vad över än dig kan sina här ha mot alla under någon eller
    allt mycket sedan ju denna själv detta åt utan varit hur ingen mitt ni
    bli blev oss din dessa några deras blir mina samma vilken er sådan vår
    blivit dess inom mellan sådant varför varje vilka ditt vem vilket
    sitta sådana vart dina vars vårt våra ert era vilkas""".split()
)
DANISH_STOP = frozenset(
    """og i jeg det at en den til er som på de med han af for ikke der var
    mig sig men et har om vi min havde ham hun nu over da fra du ud sin dem
    os op man hans hvor eller hvad skal selv her alle vil blev kunne ind
    når være dog noget ville jo deres efter ned skulle denne end dette mit
    også under have dig anden hende mine alt meget sit sine vor mod disse
    hvis din nogle hos blive mange ad bliver hendes været thi jer
    sådan""".split()
)
FINNISH_STOP = frozenset(
    """olla olen on ovat ole oli olisi olisit minä minun minut me te he se
    sen että ja jos koska kuin mutta niin sekä sitten tai vaan vai vaikka
    kanssa mukaan ei kun nyt itse tämä tämän tässä tästä tähän mikä mitä
    missä mistä joka jonka jossa josta hän ne nämä siinä""".split()
)
HUNGARIAN_STOP = frozenset(
    """a az és hogy nem is de egy ez volt már csak meg mint még el vagy ki
    mi ők ha lesz van lehet kell itt ott majd azt ezt aki ami amely arra
    erre abban ebben annak ennek által után előtt alatt fölött között ellen
    nélkül volna lenne őket minket engem téged""".split()
)
CZECH_STOP = frozenset(
    """a aby ale ani až bez bude budem budeš by byl byla byli bylo být co
    či další dnes do ho i jak jako je jeho jejich její jen ještě ji jiné
    již jsem jsi jsme jsou jste k kam kde když ke která které který kteří
    ku má mají máme mít mně mnou můj my na nad nám náš ne nebo není než ni
    nic noví o od ode on ona oni ono pak po pod podle pokud pouze práve pro
    proč proto protože první před přes při s se si sice své svůj svých ta
    tak také takže tato tedy ten tento této tím tímto to tohle toho tomto
    tu tuto ty tyto u už v vám váš ve více však všechen z za zde že""".split()
)
GREEK_STOP = frozenset(
    """ο η το οι τα του της των τον την και κι κ ειμαι εισαι ειναι ειμαστε
    ειστε στο στον στη στην μα αλλα απο για προς με σε ως παρα αντι κατα
    μετα θα να δε δεν μη μην επι ενω εαν αν τοτε που πως ποιος ποια ποιο
    ποιοι ποιες ποιων ποιους αυτος αυτη αυτο αυτοι αυτων αυτους αυτες αυτα
    εκεινος εκεινη εκεινο εκεινοι εκεινες εκεινα εκεινων εκεινους οπως ομως
    ισως οσο οτι""".split()
)
TURKISH_STOP = frozenset(
    """acaba ama aslında az bazı belki biri birkaç birşey biz bu çok çünkü
    da daha de defa diye eğer en gibi hem hep hepsi her hiç için ile ise
    kez ki kim mı mu mü nasıl ne neden nerde nerede nereye niçin niye o
    sanki şey siz şu tüm ve veya ya yani""".split()
)
ARABIC_STOP = frozenset(
    """من في على و فى يا لا ما مع ان أن إن او أو ثم بعد قبل حتى اذا إذا كل
    لم لن له لها به بها هذا هذه ذلك تلك هو هي هم هن انت أنت انا أنا نحن كان
    كانت يكون التي الذي الذين عن عند قد لقد كما لكن ليس بين""".split()
)
INDONESIAN_STOP = frozenset(
    """yang dan di ke dari pada dalam untuk dengan tidak ini itu atau juga
    sudah saya anda dia mereka kita kami akan bisa ada tetapi karena oleh
    seperti bahwa jika maka sebagai adalah ya tersebut belum lebih sangat
    banyak hanya masih telah harus ketika sementara""".split()
)
PERSIAN_STOP = frozenset(
    """و در به از که این آن را با برای است بود شد می‌شود های ها هم نیز یا
    اما اگر تا بر هر چه من تو او ما شما آنها خود دو یک نه بی پس چون روی
    میان بین باید شده کرد کند دارد""".split()
)

# ---------------------------------------------------------------- swedish
_SV_S_ENDING = frozenset("bcdfghjklmnoprtvy")
_SV_STEP1 = (
    "heterna", "hetens", "heter", "heten", "anden", "arnas", "ernas",
    "ornas", "andes", "arens", "andet", "arna", "erna", "orna", "ande",
    "arne", "aste", "aren", "ades", "erns", "ade", "are", "ern", "ens",
    "het", "ast", "ad", "en", "ar", "er", "or", "as", "es", "at", "a", "e",
)


def _r1(t: str) -> int:
    """Snowball R1: after the first non-vowel following a vowel (min 3)."""
    vowels = "aeiouyäåöæøáéíóú"
    for i in range(1, len(t)):
        if t[i] not in vowels and t[i - 1] in vowels:
            return max(i + 1, 3)
    return len(t)


def swedish_stem(t: str) -> str:
    r1 = _r1(t)
    region = t[r1:]
    for suf in _SV_STEP1:
        if region.endswith(suf):
            t = t[: len(t) - len(suf)]
            break
    else:
        if region.endswith("s") and len(t) >= 2 and t[-2] in _SV_S_ENDING:
            t = t[:-1]
    r1 = _r1(t)
    if t[r1:].endswith(("dd", "gd", "nn", "dt", "gt", "kt", "tt")):
        t = t[:-1]
    region = t[_r1(t):]
    for suf in ("lig", "els", "ig"):
        if region.endswith(suf):
            return t[: len(t) - len(suf)]
    if region.endswith("löst"):
        return t[:-1]
    if region.endswith("fullt"):
        return t[:-1]
    return t


class SwedishAnalyzer(_StemAnalyzer):
    name = "swedish"
    stopwords = SWEDISH_STOP

    def stem(self, t: str) -> str:
        return swedish_stem(t)


# ----------------------------------------------------------------- danish
_DA_S_ENDING = frozenset("abcdfghjklmnoprtvyzå")
_DA_STEP1 = (
    "erendes", "erende", "hedens", "ethed", "erede", "heden", "heder",
    "endes", "ernes", "erens", "erets", "ered", "ende", "erne", "eren",
    "erer", "heds", "enes", "eres", "eret", "hed", "ene", "ere", "ens",
    "ers", "ets", "en", "er", "es", "et", "e",
)


def danish_stem(t: str) -> str:
    r1 = _r1(t)
    region = t[r1:]
    for suf in _DA_STEP1:
        if region.endswith(suf):
            t = t[: len(t) - len(suf)]
            break
    else:
        if region.endswith("s") and len(t) >= 2 and t[-2] in _DA_S_ENDING:
            t = t[:-1]
    if t[_r1(t):].endswith(("gd", "dt", "gt", "kt")):
        t = t[:-1]
    region = t[_r1(t):]
    for suf in ("elig", "lig", "els", "ig"):
        if region.endswith(suf):
            t = t[: len(t) - len(suf)]
            break
    else:
        if region.endswith("løst"):
            t = t[:-1]
    # undouble a final double consonant in R1
    if len(t) >= 2 and t[-1] == t[-2] and t[-1] not in "aeiouyæøå" and _r1(t) < len(t):
        t = t[:-1]
    return t


class DanishAnalyzer(_StemAnalyzer):
    name = "danish"
    stopwords = DANISH_STOP

    def stem(self, t: str) -> str:
        return danish_stem(t)


# ---------------------------------------------------------------- finnish
_FI_CASE = (
    "issa", "issä", "ista", "istä", "illa", "illä", "ilta", "iltä",
    "ille", "iksi", "ssa", "ssä", "sta", "stä", "lla", "llä", "lta",
    "ltä", "lle", "ksi", "tta", "ttä", "ina", "inä", "iin", "ihin",
    "in", "an", "än", "on", "en",
)
_FI_POSS = ("nsa", "nsä", "mme", "nne", "ni", "si")


def finnish_light_stem(t: str) -> str:
    for suf in _FI_POSS:
        if t.endswith(suf) and len(t) - len(suf) >= 3:
            t = t[: len(t) - len(suf)]
            break
    for suf in _FI_CASE:
        if t.endswith(suf) and len(t) - len(suf) >= 3:
            t = t[: len(t) - len(suf)]
            break
    for _ in range(2):  # kirjat → kirja → kirj (plural t, then stem vowel)
        if t.endswith(("t", "a", "ä")) and len(t) >= 4:
            t = t[:-1]
        else:
            break
    return t


class FinnishAnalyzer(_StemAnalyzer):
    name = "finnish"
    stopwords = FINNISH_STOP

    def stem(self, t: str) -> str:
        return finnish_light_stem(t)


# --------------------------------------------------------------- hungarian
_HU_NORM = str.maketrans({"á": "a", "é": "e", "í": "i", "ó": "o", "ö": "o",
                          "ő": "o", "ú": "u", "ü": "u", "ű": "u"})
_HU_CASE = (
    "okkal", "ekkel", "ökkel", "akkal", "aknak", "eknek", "öknek",
    "okban", "ekben", "ökben", "akban", "ban", "ben", "nak", "nek",
    "val", "vel", "tól", "től", "ról", "ről", "hoz", "hez", "höz",
    "nál", "nél", "ba", "be", "ra", "re", "ig", "on", "en", "ön", "an",
    "ok", "ek", "ök", "ak", "at", "et", "ot", "öt", "t", "n", "k",
)


def hungarian_light_stem(t: str) -> str:
    t = t.translate(_HU_NORM)
    for suf in _HU_CASE:
        if t.endswith(suf) and len(t) - len(suf) >= 3:
            t = t[: len(t) - len(suf)]
            break
    # second pass: plural k-family left behind a case ending
    # (könyveket → könyvek → könyv)
    for suf in ("ok", "ek", "ök", "ak", "k"):
        if t.endswith(suf) and len(t) - len(suf) >= 3:
            t = t[: len(t) - len(suf)]
            break
    if t.endswith(("a", "e", "o")) and len(t) >= 4:
        t = t[:-1]
    return t


class HungarianAnalyzer(_StemAnalyzer):
    name = "hungarian"
    stopwords = HUNGARIAN_STOP

    def stem(self, t: str) -> str:
        return hungarian_light_stem(t)


# ------------------------------------------------------------------- czech
_CS_CASE = (
    "atech", "ětem", "atům", "ých", "ami", "ové", "ovi", "ými", "ách",
    "ata", "aty", "ého", "ěmi", "emi", "ému", "ete", "eti", "iho", "ího",
    "ími", "imu", "ima", "ech", "ich", "ích", "em", "es", "ém", "ím",
    "ům", "at", "ám", "os", "us", "ým", "mi", "ou", "e", "i", "í", "ě",
    "u", "y", "ů", "a", "o", "á", "é", "ý",
)


def czech_light_stem(t: str) -> str:
    """Dolamic & Savoy case-suffix strip (the reference CzechStemmer's main
    pass) WITHOUT the palatalization rewrite table — documented
    simplification; min stem 3."""
    for suf in _CS_CASE:
        if t.endswith(suf) and len(t) - len(suf) >= 3:
            return t[: len(t) - len(suf)]
    return t


class CzechAnalyzer(_StemAnalyzer):
    name = "czech"
    stopwords = CZECH_STOP

    def stem(self, t: str) -> str:
        return czech_light_stem(t)


# ------------------------------------------------------------------- greek
_EL_NORM = str.maketrans({
    "ά": "α", "έ": "ε", "ή": "η", "ί": "ι", "ό": "ο", "ύ": "υ", "ώ": "ω",
    "ϊ": "ι", "ϋ": "υ", "ΐ": "ι", "ΰ": "υ", "ς": "σ",
})
_EL_SUFFIX = (
    "ματων", "ματα", "ματοσ", "ιου", "ιων", "ουσ", "εων", "ων", "ου",
    "ησ", "εσ", "οσ", "ασ", "ια", "ιο", "οι", "α", "ο", "η", "ι", "ε", "υ",
)


def greek_stem(t: str) -> str:
    for suf in _EL_SUFFIX:
        if t.endswith(suf) and len(t) - len(suf) >= 3:
            return t[: len(t) - len(suf)]
    return t


class GreekAnalyzer(_StemAnalyzer):
    name = "greek"
    stopwords = GREEK_STOP

    def pre(self, t: str) -> str:
        # GreekLowerCaseFilter: lowercase + tonos fold + final sigma
        return t.lower().translate(_EL_NORM)

    def stem(self, t: str) -> str:
        return greek_stem(t)


# ----------------------------------------------------------------- turkish
_TR_LOWER = str.maketrans({"I": "ı", "İ": "i"})
_TR_SUFFIX = (
    "larının", "lerinin", "larında", "lerinde", "larından", "lerinden",
    "ların", "lerin", "lardan", "lerden", "larda", "lerde", "lara",
    "lere", "ları", "leri", "dan", "den", "tan", "ten", "lar", "ler",
    "nın", "nin", "nun", "nün", "ın", "in", "un", "ün", "sı", "si",
    "su", "sü", "da", "de", "ta", "te", "a", "e", "ı", "i", "u", "ü",
)


def turkish_light_stem(t: str) -> str:
    # agglutinative: iterate the strip (arabalarda → araba → arab, matching
    # the bare noun's own final-vowel strip), bounded at 3 passes
    for _ in range(3):
        for suf in _TR_SUFFIX:
            if t.endswith(suf) and len(t) - len(suf) >= 3:
                t = t[: len(t) - len(suf)]
                break
        else:
            break
    return t


class TurkishAnalyzer(_StemAnalyzer):
    name = "turkish"
    stopwords = TURKISH_STOP

    def pre(self, t: str) -> str:
        # ApostropheFilter: cut at the first apostrophe (Ankara'da → Ankara)
        for apo in ("'", "’"):
            i = t.find(apo)
            if i > 0:
                t = t[:i]
                break
        # TurkishLowerCaseFilter: I→ı, İ→i before the generic lowercase
        return t.translate(_TR_LOWER)

    def stem(self, t: str) -> str:
        return turkish_light_stem(t)


# ------------------------------------------------------------------ arabic
_AR_DIACRITICS = dict.fromkeys(map(ord, "ًٌٍَُِّْـ"))
_AR_NORM = str.maketrans({"أ": "ا", "إ": "ا", "آ": "ا", "ى": "ي", "ة": "ه"})
_AR_PREFIX = ("وال", "بال", "كال", "فال", "ال", "لل", "و")
_AR_SUFFIX = ("ها", "ان", "ات", "ون", "ين", "يه", "ية", "ه", "ة", "ي")


def arabic_normalize(t: str) -> str:
    return t.translate(_AR_DIACRITICS).translate(_AR_NORM)


def arabic_light_stem(t: str) -> str:
    """Larkey light10: one definite-article/conjunction prefix strip
    (remainder ≥ 2) then one suffix strip (remainder ≥ 2)."""
    for pre in _AR_PREFIX:
        if t.startswith(pre) and len(t) - len(pre) >= 2:
            t = t[len(pre):]
            break
    for suf in _AR_SUFFIX:
        if t.endswith(suf) and len(t) - len(suf) >= 2:
            t = t[: len(t) - len(suf)]
            break
    return t


class ArabicAnalyzer(_StemAnalyzer):
    name = "arabic"
    stopwords = ARABIC_STOP

    def pre(self, t: str) -> str:
        return arabic_normalize(t)

    def stem(self, t: str) -> str:
        return arabic_light_stem(t)


# -------------------------------------------------------------- indonesian
_ID_PARTICLES = ("lah", "kah", "tah", "pun")
_ID_POSS = ("nya", "ku", "mu")
_ID_SUFFIX = ("kan", "an", "i")
_ID_PREFIX = ("meng", "peng", "meny", "peny", "mem", "pem", "men", "pen",
              "ber", "ter", "per", "me", "di", "ke", "se", "be", "te", "pe")


def indonesian_light_stem(t: str) -> str:
    for suf in _ID_PARTICLES:
        if t.endswith(suf) and len(t) - len(suf) >= 3:
            t = t[: len(t) - len(suf)]
            break
    for suf in _ID_POSS:
        if t.endswith(suf) and len(t) - len(suf) >= 3:
            t = t[: len(t) - len(suf)]
            break
    for pre in _ID_PREFIX:
        if t.startswith(pre) and len(t) - len(pre) >= 3:
            t = t[len(pre):]
            break
    for suf in _ID_SUFFIX:
        if t.endswith(suf) and len(t) - len(suf) >= 3:
            t = t[: len(t) - len(suf)]
            break
    return t


class IndonesianAnalyzer(_StemAnalyzer):
    name = "indonesian"
    stopwords = INDONESIAN_STOP

    def stem(self, t: str) -> str:
        return indonesian_light_stem(t)


# ----------------------------------------------------------------- persian
_FA_NORM = str.maketrans({"ي": "ی", "ك": "ک", "ٔ": None, "أ": "ا", "إ": "ا",
                          "آ": "ا"})


class PersianAnalyzer(_StemAnalyzer):
    """persian: normalization + stopwords only — the reference's
    PersianAnalyzer (PersianNormalizationFilter, no stemmer)."""

    name = "persian"
    stopwords = PERSIAN_STOP

    def __call__(self, text):
        # PersianCharFilter: ZWNJ becomes a token break BEFORE tokenization
        return super().__call__(text.replace("\u200c", " "))

    def pre(self, t: str) -> str:
        return t.translate(_AR_DIACRITICS).translate(_FA_NORM)


register("swedish", SwedishAnalyzer)
register("danish", DanishAnalyzer)
register("finnish", FinnishAnalyzer)
register("hungarian", HungarianAnalyzer)
register("czech", CzechAnalyzer)
register("greek", GreekAnalyzer)
register("turkish", TurkishAnalyzer)
register("arabic", ArabicAnalyzer)
register("indonesian", IndonesianAnalyzer)
register("persian", PersianAnalyzer)
