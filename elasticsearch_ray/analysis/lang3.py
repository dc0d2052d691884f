"""Language analyzer chains, batch 3 — brazilian, galician, estonian,
latvian, lithuanian, hindi, bengali, armenian, basque, irish, bulgarian,
sorani, thai. With batches 1-2 (``lang.py``, ``lang2.py``) this completes
the reference's 36-analyzer registry
(``modules/analysis-common/.../CommonAnalysisPlugin.java:179-219``).

Chain shape matches the other batches: standard (UAX#29) tokens →
per-token normalize → lowercase → stop (position gaps) → stem. All stemmers
are from-scratch implementations of PUBLIC light-stemming families (the
suffix-strip approach of Jacques Savoy's CLEF work and the published light
stemmers each Lucene analyzer derives from), with a minimum-stem guard:

  brazilian / galician   Portuguese-family plural/gender strip (RSLP-derived
                         Lucene BrazilianStemmer / GalicianMinimalStemmer
                         semantics; ões→ão class, plural -s, final vowel)
  estonian / latvian / lithuanian
                         Baltic/Finnic case-ending strip, longest first
  hindi                  HindiNormalizer (nukta/matra unification) + the
                         Ramanathan & Rao light stemmer family (what Lucene
                         HindiStemmer implements): one matra/ending strip
  bengali                BengaliNormalizer + light ending strip
  armenian / basque      Snowball-site suffix families, light subset
  irish                  IrishLowerCaseFilter semantics (t-/n- prothesis
                         cut) + elision (d'/m'/b') + light ending strip
  bulgarian              the Nakov BulStem-family light rules (Lucene
                         BulgarianStemmer): definite article + plural strip
  sorani                 SoraniNormalizer (yeh/kaf unification) + light
                         ending strip (Lucene SoraniStemmer semantics)
  thai                   PARTIAL: the reference's ThaiTokenizer word-breaks
                         with a dictionary (ICU BreakIterator) which this
                         environment does not ship; Thai character runs are
                         indexed as overlapping BIGRAMS instead (the
                         standard dictionary-free fallback, same shape as
                         the cjk chain) — documented simplification

Stopword sets are compact subsets of the public Snowball / Lucene lists.
Golden fixtures in ``tests/test_lang_analyzers.py`` pin exact semantics."""

from __future__ import annotations

from elasticsearch_ray.analysis.analyzers import Analysis, Analyzer, register
from elasticsearch_ray.analysis.lang import _StemAnalyzer, elision
from elasticsearch_ray.analysis.stemmers import portuguese_light_stem
from elasticsearch_ray.analysis.tokenizer import tokenize

# --------------------------------------------------------------- stopwords
BRAZILIAN_STOP = frozenset(
    """o a os as um uma uns umas de do da dos das em no na nos nas por para
    com sem sob sobre e ou mas que se não mais muito já também só pelo pela
    ao aos à às este esta isto esse essa isso aquele aquela são ser foi eram
    como quando onde quem seu sua meu minha nosso nossa vocé você ele ela
    eles elas nós eu tu te lhe""".split()
)
GALICIAN_STOP = frozenset(
    """o a os as un unha uns unhas de do da dos das en no na nos nas por
    para con sen sobre e ou pero que se non máis moi xa tamén só polo pola
    ao aos á ás este esta isto ese esa iso aquel aquela son ser foi eran
    como cando onde quen seu súa meu miña noso nosa eu ti el ela eles
    elas""".split()
)
ESTONIAN_STOP = frozenset(
    """ja ei et see on ta ma sa me te nad oma aga ka kui siis või nii mis
    kes mida kus millal oli olid olen oled oleme olete olla ning ent vaid
    ise selle seda sellest sellele tema mina sina meie teie nemad üks kaks
    pole juba veel ainult küll siin seal nüüd""".split()
)
LATVIAN_STOP = frozenset(
    """un ir es tu viņš viņa mēs jūs viņi tas tā šis šī kas ko kam par ar
    uz no pie pēc pirms starp pret bez līdz kā ja bet vai arī jau vēl tikai
    ne nav bija būs būt savu sava šeit tur tagad tad kad kur kāpēc
    visi""".split()
)
LITHUANIAN_STOP = frozenset(
    """ir yra aš tu jis ji mes jūs jie jos tas ta šis ši kas ką kam apie su
    į iš prie po prieš tarp be iki kaip jei bet ar taip pat jau dar tik ne
    nėra buvo bus būti savo čia ten dabar tada kada kur kodėl visi""".split()
)
HINDI_STOP = frozenset(
    """का के की को में से पर है हैं था थे थी हो ही तो भी और या एक यह वह ये
    वे इस उस इन उन कि जो न ना नहीं कुछ सब अब जब तब कहा किया करना होता हुआ
    हुई हुए मैं तुम आप हम वो इसका उसका अपना""".split()
)
BENGALI_STOP = frozenset(
    """এই যে ও এবং আর কিন্তু না হয় হয়েছে ছিল করে করা হবে থেকে জন্য সঙ্গে
    সাথে মধ্যে উপর নিচে আগে পরে যদি তবে তাই আমি তুমি আপনি সে তারা আমরা
    তোমরা এটা ওটা কি কেন কোথায় কখন কিভাবে সব আছে নেই এক দুই""".split()
)
ARMENIAN_STOP = frozenset(
    """եւ և է են էր ես դու նա մենք դուք նրանք այս այն որ ինչ ով երբ ուր
    ինչպես եթե բայց կամ նաեւ նաև արդեն դեռ միայն ոչ չի կա չկա իր մեր ձեր
    այստեղ այնտեղ հիմա ապա""".split()
)
BASQUE_STOP = frozenset(
    """eta da dira zen ziren izan ni hi hura gu zu haiek hau hori zer nor
    noiz non nola baldin baina edo ere dagoeneko oraindik bakarrik ez dago
    badago bere gure zuen hemen han orain gero al bat bi""".split()
)
IRISH_STOP = frozenset(
    """agus is tá bhí beidh bheith mé tú sé sí muid sibh siad seo sin cad
    cé cathain cá conas má ach nó freisin cheana fós amháin ní níl an na ar
    ag as chuig de do faoi go i le ó roimh thar trí um a ár bhur h n
    t""".split()
)
BULGARIAN_STOP = frozenset(
    """и в на с за от до по при през е са бе беше бяха съм си се не да ще
    това този тази тези онзи която който които какво кой кога къде как ако
    но или също вече още само има няма аз ти той тя ние вие те наш ваш тук
    там сега тогава""".split()
)
SORANI_STOP = frozenset(
    """و لە بە بۆ کە ئەم ئەو لەگەڵ دوای پێش ئەگەر بەڵام یان هەروەها ئێستا
    پاشان تەنها نە نییە هەیە من تۆ ئێمە ئێوە ئەوان خۆی ئێرە ئەوێ چی کێ کەی
    لەکوێ چۆن هەموو یەک دوو""".split()
)
THAI_STOP = frozenset(
    """ที่ การ และ ใน ของ มี ไม่ ให้ ได้ ว่า เป็น จะ กับ แต่ หรือ ก็ นี้
    นั้น ซึ่ง อยู่ อย่าง เมื่อ ถ้า แล้ว จาก ไป มา ต้อง ถึง โดย""".split()
)

# --------------------------------------------------- brazilian / galician
_GL_NORM = str.maketrans({"á": "a", "é": "e", "í": "i", "ó": "o", "ú": "u",
                          "â": "a", "ê": "e", "ô": "o", "ã": "a", "õ": "o",
                          "ç": "c"})


class BrazilianAnalyzer(_StemAnalyzer):
    """brazilian: the Portuguese-family plural/gender strip with the
    Brazilian stopword list (Lucene BrazilianAnalyzer registers its own
    RSLP-derived stemmer; the light rules shared with ``portuguese`` cover
    the same inflection classes — documented simplification)."""

    name = "brazilian"
    stopwords = BRAZILIAN_STOP

    def stem(self, t: str) -> str:
        return portuguese_light_stem(t)


def galician_light_stem(t: str) -> str:
    """GalicianMinimalStemmer semantics: plural-only removal (-ns keeps the
    n; bare -s drops) + final-vowel fold, so singular and plural land on
    the same stem (cancion/cancions, neno/nenos)."""
    t = t.translate(_GL_NORM)
    if t.endswith("s") and len(t) >= 4:
        t = t[:-1]
    if t.endswith(("a", "e", "o")) and len(t) >= 4:
        t = t[:-1]
    return t


class GalicianAnalyzer(_StemAnalyzer):
    name = "galician"
    stopwords = GALICIAN_STOP

    def stem(self, t: str) -> str:
        return galician_light_stem(t)


# ------------------------------------------- estonian, latvian, lithuanian
_ET_CASE = (
    "desse", "dele", "dest", "dega", "deta", "tele", "test", "tega",
    "teta", "des", "tes", "sse", "st", "ga", "le", "lt", "ks", "ni",
    "na", "ta",
)
_ET_VOWELS = "aeiouõäöü"


def estonian_light_stem(t: str) -> str:
    for suf in _ET_CASE:
        if t.endswith(suf) and len(t) - len(suf) >= 3:
            t = t[: len(t) - len(suf)]
            break
    # nominative plural -d after a vowel (raamatud → raamatu); leaves the
    # bare singular (raamat) untouched so both fold to raamat below
    if len(t) >= 5 and t.endswith("d") and t[-2] in _ET_VOWELS:
        t = t[:-1]
    if t.endswith(("e", "u", "i", "a")) and len(t) >= 4:
        t = t[:-1]
    return t


class EstonianAnalyzer(_StemAnalyzer):
    name = "estonian"
    stopwords = ESTONIAN_STOP

    def stem(self, t: str) -> str:
        return estonian_light_stem(t)


_LV_CASE = (
    "ijiem", "ajiem", "ajām", "iem", "ām", "am", "ās", "as", "us", "os",
    "es", "em", "ij", "ie", "ai", "ei", "ui", "a", "e", "i", "u", "o",
    "s", "š",
)


def latvian_light_stem(t: str) -> str:
    for suf in _LV_CASE:
        if t.endswith(suf) and len(t) - len(suf) >= 3:
            return t[: len(t) - len(suf)]
    return t


class LatvianAnalyzer(_StemAnalyzer):
    name = "latvian"
    stopwords = LATVIAN_STOP

    def stem(self, t: str) -> str:
        return latvian_light_stem(t)


_LT_CASE = (
    "iuose", "uose", "iams", "omis", "ėmis", "imis", "ams", "ais", "oms",
    "ėms", "ose", "yje", "oje", "ėje", "ių", "ui", "ai", "as", "is", "ys",
    "us", "os", "es", "ą", "ę", "į", "ų", "ė", "a", "o", "u", "i", "e", "s",
)


def lithuanian_light_stem(t: str) -> str:
    for suf in _LT_CASE:
        if t.endswith(suf) and len(t) - len(suf) >= 3:
            return t[: len(t) - len(suf)]
    return t


class LithuanianAnalyzer(_StemAnalyzer):
    name = "lithuanian"
    stopwords = LITHUANIAN_STOP

    def stem(self, t: str) -> str:
        return lithuanian_light_stem(t)


# ------------------------------------------------------------------- hindi
# HindiNormalizer: drop the nukta (U+093C — folds क़→क etc. whether the
# source is precomposed-NFD or combining) and fold chandrabindu→anusvara
_HI_NORM = str.maketrans({"\u093c": None, "ॅ": "े", "ँ": "ं"})
_HI_SUFFIX = (
    "ियाँ", "ियों", "ाएं", "ाओं", "ुओं", "ुएं", "ुआं", "ों", "ें", "ीं",
    "ाँ", "ां", "ा", "ि", "ी", "ु", "ू", "े", "ो", "ं",
)


def hindi_light_stem(t: str) -> str:
    """Ramanathan & Rao light stemmer family: ONE matra/ending strip with a
    minimum stem of 2 aksharas (what Lucene HindiStemmer does)."""
    for suf in _HI_SUFFIX:
        if t.endswith(suf) and len(t) - len(suf) >= 2:
            return t[: len(t) - len(suf)]
    return t


class HindiAnalyzer(_StemAnalyzer):
    name = "hindi"
    stopwords = HINDI_STOP

    def pre(self, t: str) -> str:
        return t.translate(_HI_NORM)

    def stem(self, t: str) -> str:
        return hindi_light_stem(t)


# ----------------------------------------------------------------- bengali
# BengaliNormalizer: drop the nukta (U+09BC) — folds য়→য, ড়→ড, ঢ়→ঢ
_BN_NORM = str.maketrans({"\u09bc": None, "\u09df": "য", "\u09dd": "ঢ",
                          "\u09dc": "ড"})
_BN_SUFFIX = (
    "গুলোর", "গুলো", "গুলি", "দেরকে", "দের", "েরা", "কে", "ের", "টির",
    "টি", "টা", "রা", "েতে", "তে", "ে", "র",
)


def bengali_light_stem(t: str) -> str:
    for _ in range(2):  # ছেলেদের → ছেলে → ছেল (case ending, then matra)
        for suf in _BN_SUFFIX:
            if t.endswith(suf) and len(t) - len(suf) >= 2:
                t = t[: len(t) - len(suf)]
                break
        else:
            break
    return t


class BengaliAnalyzer(_StemAnalyzer):
    name = "bengali"
    stopwords = BENGALI_STOP

    def pre(self, t: str) -> str:
        return t.translate(_BN_NORM)

    def stem(self, t: str) -> str:
        return bengali_light_stem(t)


# ---------------------------------------------------------------- armenian
_HY_SUFFIX = (
    "ներին", "ներով", "ները", "ների", "ներ", "երի", "երով", "եր", "ում",
    "ով", "ին", "ի", "ը", "ն",
)


def armenian_light_stem(t: str) -> str:
    for _ in range(2):  # գրքերը → գրքեր → գրք (article, then plural)
        for suf in _HY_SUFFIX:
            if t.endswith(suf) and len(t) - len(suf) >= 3:
                t = t[: len(t) - len(suf)]
                break
        else:
            break
    return t


class ArmenianAnalyzer(_StemAnalyzer):
    name = "armenian"
    stopwords = ARMENIAN_STOP

    def stem(self, t: str) -> str:
        return armenian_light_stem(t)


# ------------------------------------------------------------------ basque
_EU_SUFFIX = (
    "etako", "etara", "etan", "aren", "arekin", "ekin", "ean", "eko",
    "ari", "ak", "en", "an", "a", "ek", "ra",
)


def basque_light_stem(t: str) -> str:
    for suf in _EU_SUFFIX:
        if t.endswith(suf) and len(t) - len(suf) >= 3:
            return t[: len(t) - len(suf)]
    return t


class BasqueAnalyzer(_StemAnalyzer):
    name = "basque"
    stopwords = BASQUE_STOP

    def stem(self, t: str) -> str:
        return basque_light_stem(t)


# ------------------------------------------------------------------- irish
IRISH_ARTICLES = frozenset("d m b".split())
_GA_SUFFIX = ("eacha", "acha", "anna", "aí", "í", "ach")


def irish_light_stem(t: str) -> str:
    for suf in _GA_SUFFIX:
        if t.endswith(suf) and len(t) - len(suf) >= 3:
            return t[: len(t) - len(suf)]
    return t


class IrishAnalyzer(_StemAnalyzer):
    name = "irish"
    stopwords = IRISH_STOP

    def pre(self, t: str) -> str:
        # IrishLowerCaseFilter: strip the t-/n- prothesis before an initial
        # vowel (t-athair → athair, n-éan → éan), then elision (d'/m'/b')
        low = t.lower()
        if len(low) > 2 and low[1] == "-" and low[0] in "tn":
            low = low[2:]
        return elision(low, IRISH_ARTICLES)

    def stem(self, t: str) -> str:
        return irish_light_stem(t)


# --------------------------------------------------------------- bulgarian
_BG_SUFFIX = (
    "ията", "ище", "ът", "та", "то", "те", "ят", "ия", "и", "е", "а", "я",
    "о", "ове", "еве",
)


def bulgarian_light_stem(t: str) -> str:
    """BulStem-family (Nakov) light rules: one definite-article / plural
    ending strip, longest first, min stem 3 (Lucene BulgarianStemmer's
    main pass without the e/i alternation rewrites)."""
    for _ in range(2):  # книгите → книги → книг (article, then plural)
        for suf in sorted(_BG_SUFFIX, key=len, reverse=True):
            if t.endswith(suf) and len(t) - len(suf) >= 3:
                t = t[: len(t) - len(suf)]
                break
        else:
            break
    return t


class BulgarianAnalyzer(_StemAnalyzer):
    name = "bulgarian"
    stopwords = BULGARIAN_STOP

    def stem(self, t: str) -> str:
        return bulgarian_light_stem(t)


# ------------------------------------------------------------------ sorani
_CKB_NORM = str.maketrans({"ي": "ی", "ك": "ک", "\u200c": None})
_CKB_SUFFIX = (
    "ەکانی", "ەکان", "ەکە", "کانی", "کان", "ێکی", "ێک", "یش", "مان",
    "تان", "یان", "انی", "ان", "ەی", "ە", "ی",
)


def sorani_light_stem(t: str) -> str:
    for suf in _CKB_SUFFIX:
        if t.endswith(suf) and len(t) - len(suf) >= 2:
            return t[: len(t) - len(suf)]
    return t


class SoraniAnalyzer(_StemAnalyzer):
    name = "sorani"
    stopwords = SORANI_STOP

    def pre(self, t: str) -> str:
        return t.translate(_CKB_NORM)

    def stem(self, t: str) -> str:
        return sorani_light_stem(t)


# -------------------------------------------------------------------- thai
def _is_thai(ch: str) -> bool:
    return 0x0E00 <= ord(ch) <= 0x0E7F


class ThaiAnalyzer(Analyzer):
    """thai (PARTIAL): overlapping bigrams over Thai character runs (module
    docstring) — non-Thai tokens pass through lowercased; Thai stopwords
    are matched against whole runs before bigramming."""

    name = "thai"

    def __call__(self, text: str) -> Analysis:
        terms: list[str] = []
        positions: list[int] = []
        pos = 0
        for tok in tokenize(text):
            t = tok.lower()
            if all(_is_thai(ch) for ch in t):
                if t in THAI_STOP:
                    pos += 1
                    continue
                if len(t) == 1:
                    terms.append(t)
                    positions.append(pos)
                    pos += 1
                else:
                    for i in range(len(t) - 1):
                        terms.append(t[i : i + 2])
                        positions.append(pos)
                        pos += 1
            else:
                terms.append(t)
                positions.append(pos)
                pos += 1
        return terms, positions


register("brazilian", BrazilianAnalyzer)
register("galician", GalicianAnalyzer)
register("estonian", EstonianAnalyzer)
register("latvian", LatvianAnalyzer)
register("lithuanian", LithuanianAnalyzer)
register("hindi", HindiAnalyzer)
register("bengali", BengaliAnalyzer)
register("armenian", ArmenianAnalyzer)
register("basque", BasqueAnalyzer)
register("irish", IrishAnalyzer)
register("bulgarian", BulgarianAnalyzer)
register("sorani", SoraniAnalyzer)
register("thai", ThaiAnalyzer)
