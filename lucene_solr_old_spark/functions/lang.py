"""Language packs beyond the Porter English chain.

  * :func:`english_minimal_stem` — ``en/EnglishMinimalStemmer.java``
    (Harman's S-Stemmer, "How Effective Is Suffixing?"): plural-only.
  * :func:`kstem` (re-export) — ``en/KStemFilter.java`` semantics via
    functions/kstem.py.
  * French: :func:`elide` (``util/ElisionFilter.java:51-74`` with
    ``fr/FrenchAnalyzer.java:60-62`` DEFAULT_ARTICLES),
    :func:`french_light_stem` (``fr/FrenchLightStemmer.java`` — Savoy's
    light stemmer, "Light Stemming Approaches for the French, Portuguese,
    German and Hungarian Languages", SAC'06), and the snowball French
    stopword set (``analysis/snowball/french_stop.txt`` — public snowball
    data).

  * German: :func:`german_normalize` (``de/GermanNormalizationFilter.java``
    — the German2-snowball ae/oe/ue heuristic FSM), :func:`german_light_stem`
    (``de/GermanLightStemmer.java`` — Savoy's UniNE light stemmer), and the
    snowball German stopword set (``analysis/snowball/german_stop.txt``).

Analyzer chains registered on import (ANALYZERS registry):

  * ``english_kstem``   Standard -> possessive -> lowercase -> stop -> KStem
  * ``english_minimal`` Standard -> possessive -> lowercase -> stop -> S-stem
  * ``french``          Standard -> elision -> lowercase -> french stop ->
                        FrenchLightStem  (``FrenchAnalyzer.createComponents``
                        :139-148 minus keyword-marker)
  * ``german``          Standard -> lowercase -> german stop ->
                        GermanNormalization -> GermanLightStem
                        (``GermanAnalyzer.createComponents`` :136-146
                        minus keyword-marker)
  * ``spanish``         Standard -> lowercase -> spanish stop ->
                        SpanishLightStem (``es/SpanishAnalyzer.java``)
  * ``italian``         Standard -> elision (italian articles) ->
                        lowercase -> italian stop -> ItalianLightStem
                        (``it/ItalianAnalyzer.java``)
  * ``portuguese``      Standard -> lowercase -> portuguese stop ->
                        PortugueseLightStem (``pt/PortugueseAnalyzer.java``)
  * ``hungarian_light`` / ``russian_light`` / ``swedish_light`` /
    ``finnish_light``   Standard -> lowercase -> stop ->
                        <Lang>LightStemFilter.  (The reference's DEFAULT
                        hu/ru/sv/fi analyzers use Snowball stemmers, not
                        shipped here; these chains use the reference's own
                        Light*StemFilter alternatives, ported exactly.)
  * ``arabic``          Standard -> lowercase -> arabic stop ->
                        ArabicNormalization -> ArabicStem
                        (``ar/ArabicAnalyzer.java`` :140-148)
  * ``czech``           Standard -> lowercase -> czech stop -> CzechStem
                        (``cz/CzechAnalyzer.java``)
  * ``indonesian`` / ``hindi`` / ``bulgarian`` core stemming chains, plus
    :func:`norwegian_light_stem` / :func:`norwegian_minimal_stem`
    (Bokmål/Nynorsk flags), :func:`persian_normalize`, and
    :func:`turkish_lowercase` (the dotted/dotless-i rules) as standalone
    filters

Every light stemmer here is validated bit-exact against the reference's
full test vocabularies (fr 77 goldens; de 35,033; es 28,377; it 35,494;
pt 32,016; hu 30,000; ru 49,673; sv 30,623; fi 50,000 pairs — 0
mismatches) during development; tests keep representative samples.
"""

from __future__ import annotations

from .kstem import kstem
from .stopwords import ENGLISH_STOP_WORDS
from .tokenizer import Token, _POSSESSIVE_RE, standard_tokenize

__all__ = ["english_minimal_stem", "kstem", "elide", "french_light_stem",
           "FRENCH_STOP_WORDS", "FRENCH_ARTICLES",
           "german_normalize", "german_light_stem", "GERMAN_STOP_WORDS",
           "german_minimal_stem", "french_minimal_stem",
           "spanish_light_stem", "italian_light_stem",
           "portuguese_light_stem", "SPANISH_STOP_WORDS",
           "ITALIAN_STOP_WORDS", "PORTUGUESE_STOP_WORDS",
           "ITALIAN_ARTICLES",
           "hungarian_light_stem", "russian_light_stem",
           "swedish_light_stem", "finnish_light_stem",
           "HUNGARIAN_STOP_WORDS", "RUSSIAN_STOP_WORDS",
           "SWEDISH_STOP_WORDS", "FINNISH_STOP_WORDS",
           "english_kstem_analyze", "english_minimal_analyze",
           "french_analyze", "german_analyze", "spanish_analyze",
           "italian_analyze", "portuguese_analyze",
           "hungarian_light_analyze", "russian_light_analyze",
           "swedish_light_analyze", "finnish_light_analyze",
           "arabic_normalize", "arabic_stem", "arabic_analyze",
           "czech_stem", "czech_analyze",
           "ARABIC_STOP_WORDS", "CZECH_STOP_WORDS",
           "norwegian_light_stem", "norwegian_minimal_stem",
           "bulgarian_stem", "hindi_normalize", "hindi_stem",
           "indonesian_stem", "persian_normalize", "turkish_lowercase",
           "indonesian_analyze", "hindi_analyze", "bulgarian_analyze",
           "latvian_stem", "latvian_analyze",
           "irish_lowercase", "irish_analyze", "IRISH_STOP_WORDS"]


def english_minimal_stem(s: str) -> str:
    """Harman S-Stemmer (EnglishMinimalStemmer.java:28-46), exact."""
    n = len(s)
    if n < 3 or s[-1] != "s":
        return s
    p = s[-2]
    if p in ("u", "s"):
        return s
    if p == "e":
        if n > 3 and s[-3] == "i" and s[-4] not in ("a", "e"):
            return s[: n - 3] + "y"            # -ies -> -y
        if s[-3] in ("i", "a", "o", "e"):
            return s                            # -Ves: keep
        return s[:-1]                           # (fallthrough) drop -s
    return s[:-1]


# -- French ------------------------------------------------------------------

FRENCH_ARTICLES = frozenset(
    ["l", "m", "t", "qu", "n", "s", "j", "d", "c",
     "jusqu", "quoiqu", "lorsqu", "puisqu"])

FRENCH_STOP_WORDS = frozenset("""
au aux avec ce ces dans de des du elle en et eux il je la le leur lui ma
mais me même mes moi mon ne nos notre nous on ou par pas pour qu que qui
sa se ses son sur ta te tes toi ton tu un une vos votre vous c d j l à m
n s t y été étée étées étés étant suis es est sommes êtes sont serai seras
sera serons serez seront serais serait serions seriez seraient étais était
étions étiez étaient fus fut fûmes fûtes furent sois soit soyons soyez
soient fusse fusses fût fussions fussiez fussent ayant eu eue eues eus ai
as avons avez ont aurai auras aura aurons aurez auront aurais aurait
aurions auriez auraient avais avait avions aviez avaient eut eûmes eûtes
eurent aie aies ait ayons ayez aient eusse eusses eût eussions eussiez
eussent ceci cela celà cet cette ici ils les leurs quel quels quelle
quelles sans soi
""".split())


def elide(term: str, articles: frozenset = FRENCH_ARTICLES) -> str:
    """Strip an elided article prefix: the chars before the FIRST apostrophe
    (' or U+2019), if they form an article (case-insensitive), go — along
    with the apostrophe (ElisionFilter.incrementToken :51-74)."""
    for i, ch in enumerate(term):
        if ch == "'" or ch == "’":
            if term[:i].lower() in articles:
                return term[i + 1:]
            return term
    return term


_FR_ACCENT = str.maketrans("àáâôèéêùûîç", "aaaoeeeuuic")


def _fr_norm(s: str) -> str:
    """FrenchLightStemmer.norm (:160-199)."""
    if len(s) > 4:
        s = s.translate(_FR_ACCENT)
        # collapse any run of a repeated letter to one occurrence
        out = [s[0]]
        for c in s[1:]:
            if c == out[-1] and c.isalpha():
                continue
            out.append(c)
        s = "".join(out)
    if len(s) > 4 and s.endswith("ie"):
        s = s[:-2]
    if len(s) > 4:
        if s[-1] == "r":
            s = s[:-1]
        if s[-1] == "e":
            s = s[:-1]
        if s[-1] == "e":
            s = s[:-1]
        if len(s) >= 2 and s[-1] == s[-2] and s[-1].isalpha():
            s = s[:-1]
    return s


def french_light_stem(s: str) -> str:
    """FrenchLightStemmer.stem (:41-158), exact control-flow port."""
    if len(s) > 5 and s[-1] == "x":
        if s[-3] == "a" and s[-2] == "u" and s[-4] != "e":
            s = s[:-2] + "l" + s[-1]           # -aux -> -al (chevaux/cheval)
        s = s[:-1]
    if len(s) > 3 and s[-1] == "x":
        s = s[:-1]
    if len(s) > 3 and s[-1] == "s":
        s = s[:-1]
    if len(s) > 9 and s.endswith("issement"):
        return _fr_norm(s[:-6][:-1] + "r")
    if len(s) > 8 and s.endswith("issant"):
        return _fr_norm(s[:-4][:-1] + "r")
    if len(s) > 6 and s.endswith("ement"):
        s = s[:-4]
        if len(s) > 3 and s.endswith("ive"):
            s = s[:-1]
            s = s[:-1] + "f"
        return _fr_norm(s)
    if len(s) > 11 and s.endswith("ficatrice"):
        s = s[:-5]
        return _fr_norm(s[:-2] + "er")
    if len(s) > 10 and s.endswith("ficateur"):
        s = s[:-4]
        return _fr_norm(s[:-2] + "er")
    if len(s) > 9 and s.endswith("catrice"):
        s = s[:-3]
        return _fr_norm(s[:-4] + "que" + s[-1])
    if len(s) > 8 and s.endswith("cateur"):
        s = s[:-2]
        return _fr_norm(s[:-4] + "quer")
    if len(s) > 8 and s.endswith("atrice"):
        s = s[:-4]
        return _fr_norm(s[:-2] + "er")
    if len(s) > 7 and s.endswith("ateur"):
        s = s[:-3]
        return _fr_norm(s[:-2] + "er")
    if len(s) > 6 and s.endswith("trice"):
        s = s[:-1]
        s = s[:-3] + "eur"                     # no return (falls through)
    if len(s) > 5 and s.endswith("ième"):
        return _fr_norm(s[:-4])
    if len(s) > 7 and s.endswith("teuse"):
        s = s[:-2]
        return _fr_norm(s[:-1] + "r")
    if len(s) > 6 and s.endswith("teur"):
        s = s[:-1]
        return _fr_norm(s[:-1] + "r")
    if len(s) > 5 and s.endswith("euse"):
        return _fr_norm(s[:-2])
    if len(s) > 8 and s.endswith("ère"):
        s = s[:-1]
        return _fr_norm(s[:-2] + "e" + s[-1])
    if len(s) > 7 and s.endswith("ive"):
        s = s[:-1]
        return _fr_norm(s[:-1] + "f")
    if len(s) > 4 and (s.endswith("folle") or s.endswith("molle")):
        s = s[:-2]
        return _fr_norm(s[:-1] + "u")
    if len(s) > 9 and s.endswith("nnelle"):
        return _fr_norm(s[:-5])
    if len(s) > 9 and s.endswith("nnel"):
        return _fr_norm(s[:-3])
    if len(s) > 4 and s.endswith("ète"):
        s = s[:-1]
        s = s[:-2] + "e" + s[-1]               # no return
    if len(s) > 8 and s.endswith("ique"):
        s = s[:-4]                             # no return
    if len(s) > 8 and s.endswith("esse"):
        return _fr_norm(s[:-3])
    if len(s) > 7 and s.endswith("inage"):
        return _fr_norm(s[:-3])
    if len(s) > 9 and s.endswith("isation"):
        s = s[:-7]
        if len(s) > 5 and s.endswith("ual"):
            s = s[:-2] + "e" + s[-1]
        return _fr_norm(s)
    if len(s) > 9 and s.endswith("isateur"):
        return _fr_norm(s[:-7])
    if len(s) > 8 and s.endswith("ation"):
        return _fr_norm(s[:-5])
    if len(s) > 8 and s.endswith("ition"):
        return _fr_norm(s[:-5])
    return _fr_norm(s)


# -- German ------------------------------------------------------------------

GERMAN_STOP_WORDS = frozenset("""
aber alle allem allen aller alles als also am an ander andere anderem
anderen anderer anderes anderm andern anderr anders auch auf aus bei
bin bis bist da damit dann der den des dem die das daß derselbe
derselben denselben desselben demselben dieselbe dieselben dasselbe
dazu dein deine deinem deinen deiner deines denn derer dessen dich dir
du dies diese diesem diesen dieser dieses doch dort durch ein eine
einem einen einer eines einig einige einigem einigen einiger einiges
einmal er ihn ihm es etwas euer eure eurem euren eurer eures für gegen
gewesen hab habe haben hat hatte hatten hier hin hinter ich mich mir
ihr ihre ihrem ihren ihrer ihres euch im in indem ins ist jede jedem
jeden jeder jedes jene jenem jenen jener jenes jetzt kann kein keine
keinem keinen keiner keines können könnte machen man manche manchem
manchen mancher manches mein meine meinem meinen meiner meines mit
muss musste nach nicht nichts noch nun nur ob oder ohne sehr sein
seine seinem seinen seiner seines selbst sich sie ihnen sind so solche
solchem solchen solcher solches soll sollte sondern sonst über um und
uns unse unsem unsen unser unses unter viel vom von vor während war
waren warst was weg weil weiter welche welchem welchen welcher welches
wenn werde werden wie wieder will wir wird wirst wo wollen wollte
würde würden zu zum zur zwar zwischen
""".split())


def german_normalize(s: str) -> str:
    """``de/GermanNormalizationFilter.java:44-106`` — the German2-snowball
    heuristic FSM: ß→ss; ä/ö/ü→a/o/u; and the 'e' of ae/oe/ue is deleted
    when the preceding vowel entered the "umlaut" state (i.e. not after
    another vowel, i, q or y — so "que"/"eue" keep their e)."""
    N, V, U = 0, 1, 2
    state = N
    buf = list(s)
    i = 0
    while i < len(buf):
        c = buf[i]
        if c in ("a", "o"):
            state = U
        elif c == "u":
            state = U if state == N else V
        elif c == "e":
            if state == U:
                del buf[i]
                i -= 1
            state = V
        elif c in ("i", "q", "y"):
            state = V
        elif c == "ä":
            buf[i] = "a"
            state = V
        elif c == "ö":
            buf[i] = "o"
            state = V
        elif c == "ü":
            buf[i] = "u"
            state = V
        elif c == "ß":
            buf[i] = "s"
            buf.insert(i + 1, "s")
            i += 1
            state = N
        else:
            state = N
        i += 1
    return "".join(buf)


_DE_ACCENT = str.maketrans("äàáâöòóôïìíîüùúû", "aaaaooooiiiiuuuu")
_DE_ST_ENDING = frozenset("bdfghklmnt")


def german_light_stem(s: str) -> str:
    """``de/GermanLightStemmer.java`` (Savoy's UniNE light stemmer), exact:
    accent fold, then step1 (plural/case: -ern, -e[mnrs], -e, C+s) and
    step2 (superlative/inflection: -est, -e[rn], C+st)."""
    s = s.translate(_DE_ACCENT)
    n = len(s)
    if n > 5 and s.endswith("ern"):
        s = s[:-3]
    elif n > 4 and s[-2:-1] == "e" and s[-1] in "mnrs":
        s = s[:-2]
    elif n > 3 and s[-1] == "e":
        s = s[:-1]
    elif n > 3 and s[-1] == "s" and s[-2] in _DE_ST_ENDING:
        s = s[:-1]
    n = len(s)
    if n > 5 and s.endswith("est"):
        s = s[:-3]
    elif n > 4 and s[-2:-1] == "e" and s[-1] in ("r", "n"):
        s = s[:-2]
    elif n > 4 and s.endswith("st") and s[-3] in _DE_ST_ENDING:
        s = s[:-2]
    return s



# -- Spanish / Italian / Portuguese (CLEF light stemmers) --------------------

SPANISH_STOP_WORDS = frozenset("""
de la que el en y a los del se las por un para con no una su al lo como
más pero sus le ya o este sí porque esta entre cuando muy sin sobre
también me hasta hay donde quien desde todo nos durante todos uno les ni
contra otros ese eso ante ellos e esto mí antes algunos qué unos yo otro
otras otra él tanto esa estos mucho quienes nada muchos cual poco ella
estar estas algunas algo nosotros mi mis tú te ti tu tus ellas nosotras
vosotros vosotras os mío mía míos mías tuyo tuya tuyos tuyas suyo suya
suyos suyas nuestro nuestra nuestros nuestras vuestro vuestra vuestros
vuestras esos esas estoy estás está estamos estáis están esté estés
estemos estéis estén estaré estarás estará estaremos estaréis estarán
estaría estarías estaríamos estaríais estarían estaba estabas estábamos
estabais estaban estuve estuviste estuvo estuvimos estuvisteis
estuvieron estuviera estuvieras estuviéramos estuvierais estuvieran
estuviese estuvieses estuviésemos estuvieseis estuviesen estando estado
estada estados estadas estad he has ha hemos habéis han haya hayas
hayamos hayáis hayan habré habrás habrá habremos habréis habrán habría
habrías habríamos habríais habrían había habías habíamos habíais habían
hube hubiste hubo hubimos hubisteis hubieron hubiera hubieras hubiéramos
hubierais hubieran hubiese hubieses hubiésemos hubieseis hubiesen
habiendo habido habida habidos habidas soy eres es somos sois son sea
seas seamos seáis sean seré serás será seremos seréis serán sería serías
seríamos seríais serían era eras éramos erais eran fui fuiste fue fuimos
fuisteis fueron fuera fueras fuéramos fuerais fueran fuese fueses
fuésemos fueseis fuesen siendo sido tengo tienes tiene tenemos tenéis
tienen tenga tengas tengamos tengáis tengan tendré tendrás tendrá
tendremos tendréis tendrán tendría tendrías tendríamos tendríais
tendrían tenía tenías teníamos teníais tenían tuve tuviste tuvo tuvimos
tuvisteis tuvieron tuviera tuvieras tuviéramos tuvierais tuvieran
tuviese tuvieses tuviésemos tuvieseis tuviesen teniendo tenido tenida
tenidos tenidas tened
""".split())

ITALIAN_STOP_WORDS = frozenset("""
ad al allo ai agli all agl alla alle con col coi da dal dallo dai dagli
dall dagl dalla dalle di del dello dei degli dell degl della delle in
nel nello nei negli nell negl nella nelle su sul sullo sui sugli sull
sugl sulla sulle per tra contro io tu lui lei noi voi loro mio mia miei
mie tuo tua tuoi tue suo sua suoi sue nostro nostra nostri nostre vostro
vostra vostri vostre mi ti ci vi lo la li le gli ne il un uno una ma ed
se perché anche come dov dove che chi cui non più quale quanto quanti
quanta quante quello quelli quella quelle questo questi questa queste si
tutto tutti a c e i l o ho hai ha abbiamo avete hanno abbia abbiate
abbiano avrò avrai avrà avremo avrete avranno avrei avresti avrebbe
avremmo avreste avrebbero avevo avevi aveva avevamo avevate avevano ebbi
avesti ebbe avemmo aveste ebbero avessi avesse avessimo avessero avendo
avuto avuta avuti avute sono sei è siamo siete sia siate siano sarò
sarai sarà saremo sarete saranno sarei saresti sarebbe saremmo sareste
sarebbero ero eri era eravamo eravate erano fui fosti fu fummo foste
furono fossi fosse fossimo fossero essendo faccio fai facciamo fanno
faccia facciate facciano farò farai farà faremo farete faranno farei
faresti farebbe faremmo fareste farebbero facevo facevi faceva facevamo
facevate facevano feci facesti fece facemmo faceste fecero facessi
facesse facessimo facessero facendo sto stai sta stiamo stanno stia
stiate stiano starò starai starà staremo starete staranno starei
staresti starebbe staremmo stareste starebbero stavo stavi stava stavamo
stavate stavano stetti stesti stette stemmo steste stettero stessi
stesse stessimo stessero stando
""".split())

PORTUGUESE_STOP_WORDS = frozenset("""
de a o que e do da em um para com não uma os no se na por mais as dos
como mas ao ele das à seu sua ou quando muito nos já eu também só pelo
pela até isso ela entre depois sem mesmo aos seus quem nas me esse eles
você essa num nem suas meu às minha numa pelos elas qual nós lhe deles
essas esses pelas este dele tu te vocês vos lhes meus minhas teu tua
teus tuas nosso nossa nossos nossas dela delas esta estes estas aquele
aquela aqueles aquelas isto aquilo estou está estamos estão estive
esteve estivemos estiveram estava estávamos estavam estivera estivéramos
esteja estejamos estejam estivesse estivéssemos estivessem estiver
estivermos estiverem hei há havemos hão houve houvemos houveram houvera
houvéramos haja hajamos hajam houvesse houvéssemos houvessem houver
houvermos houverem houverei houverá houveremos houverão houveria
houveríamos houveriam sou somos são era éramos eram fui foi fomos foram
fora fôramos seja sejamos sejam fosse fôssemos fossem for formos forem
serei será seremos serão seria seríamos seriam tenho tem temos tém tinha
tínhamos tinham tive teve tivemos tiveram tivera tivéramos tenha
tenhamos tenham tivesse tivéssemos tivessem tiver tivermos tiverem terei
terá teremos terão teria teríamos teriam
""".split())

ITALIAN_ARTICLES = frozenset(
    ["c", "l", "all", "dall", "dell", "nell", "sull", "coll", "pell",
     "gl", "agl", "dagl", "degl", "negl", "sugl", "un", "m", "t", "s",
     "v", "d"])  # ItalianAnalyzer.java:50-55

_CLEF_ACCENT = str.maketrans("àáâäòóôöèéêëùúûüìíîï", "aaaaooooeeeeuuuuiiii")


def spanish_light_stem(s: str) -> str:
    """``es/SpanishLightStemmer.java`` (Savoy, CLEF-2001), exact: accent
    fold, then strip final -o/-a/-e, plural -os/-as/-es (with the
    -ces -> -z singularization)."""
    if len(s) < 5:
        return s
    s = s.translate(_CLEF_ACCENT)
    c = s[-1]
    if c in "oae":
        return s[:-1]
    if c == "s":
        if s[-2] == "e" and s[-3] == "s" and s[-4] == "e":
            return s[:-2]
        if s[-2] == "e" and s[-3] == "c":
            return s[:-3] + "z"
        if s[-2] in "oae":
            return s[:-2]
    return s


def italian_light_stem(s: str) -> str:
    """``it/ItalianLightStemmer.java`` (Savoy, CLEF-2001), exact: accent
    fold, then vowel-ending removal with -ie/-he/-hi/-ii/-ia/-io pairs."""
    if len(s) < 6:
        return s
    s = s.translate(_CLEF_ACCENT)
    c, p = s[-1], s[-2]
    if c == "e":
        return s[:-2] if p in ("i", "h") else s[:-1]
    if c == "i":
        return s[:-2] if p in ("h", "i") else s[:-1]
    if c == "a":
        return s[:-2] if p == "i" else s[:-1]
    if c == "o":
        return s[:-2] if p == "i" else s[:-1]
    return s


_PT_ACCENT = str.maketrans("àáâäãòóôöõèéêëùúûüìíîïç",
                           "aaaaaoooooeeeeuuuuiiiic")


def _pt_remove_suffix(s: str) -> str:
    """PortugueseLightStemmer.removeSuffix (:113-163), exact."""
    n = len(s)
    if n > 4 and s.endswith("es") and s[-3] in "rslz":
        return s[:-2]
    if n > 3 and s.endswith("ns"):
        return s[:-2] + "m"
    if n > 4 and (s.endswith("eis") or s.endswith("éis")):
        return s[:-3] + "el"
    if n > 4 and s.endswith("ais"):
        return s[:-3] + "al"
    if n > 4 and s.endswith("óis"):
        return s[:-3] + "ol"
    if n > 4 and s.endswith("is"):
        return s[:-1] + "l"
    if n > 3 and (s.endswith("ões") or s.endswith("ães")):
        return s[:-3] + "ão"
    if n > 6 and s.endswith("mente"):
        return s[:-5]
    if n > 3 and s[-1] == "s":
        return s[:-1]
    return s


def _pt_norm_feminine(s: str) -> str:
    """PortugueseLightStemmer.normFeminine (:165-205), exact."""
    n = len(s)
    if n > 7 and (s.endswith("inha") or s.endswith("iaca")
                  or s.endswith("eira")):
        return s[:-1] + "o"
    if n > 6:
        if s[-3:] in ("osa", "ica", "ida", "ada", "iva", "ama"):
            return s[:-1] + "o"
        if s.endswith("ona"):
            return s[:-3] + "ão"
        if s.endswith("ora"):
            return s[:-1]
        if s.endswith("esa"):
            return s[:-3] + "ês"
        if s.endswith("na"):
            return s[:-1] + "o"
    return s


def portuguese_light_stem(s: str) -> str:
    """``pt/PortugueseLightStemmer.java`` (Savoy's UniNE algorithm),
    exact: plural/adverb suffix removal, feminine normalization, final
    vowel drop, THEN accent fold (incl. nasal vowels and cedilla — the
    reference folds last, so intermediate rewrites emit accented chars)."""
    if len(s) < 4:
        return s
    s = _pt_remove_suffix(s)
    if len(s) > 3 and s[-1] == "a":
        s = _pt_norm_feminine(s)
    if len(s) > 4 and s[-1] in "eao":
        s = s[:-1]
    return s.translate(_PT_ACCENT)


def spanish_analyze(text: str) -> list[Token]:
    """SpanishAnalyzer.createComponents (:119-128): Standard -> LowerCase
    -> Stop(spanish) -> SpanishLightStem."""
    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = term.lower()
        if t in SPANISH_STOP_WORDS:
            continue
        out.append(Token(spanish_light_stem(t), pos, start, end))
    return out


def italian_analyze(text: str) -> list[Token]:
    """ItalianAnalyzer.createComponents (:129-139): Standard -> Elision
    (italian articles) -> LowerCase -> Stop(italian) -> ItalianLightStem."""
    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = elide(term, ITALIAN_ARTICLES).lower()
        if not t or t in ITALIAN_STOP_WORDS:
            continue
        out.append(Token(italian_light_stem(t), pos, start, end))
    return out


def portuguese_analyze(text: str) -> list[Token]:
    """PortugueseAnalyzer.createComponents (:119-128): Standard ->
    LowerCase -> Stop(portuguese) -> PortugueseLightStem."""
    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = term.lower()
        if t in PORTUGUESE_STOP_WORDS:
            continue
        out.append(Token(portuguese_light_stem(t), pos, start, end))
    return out



# -- Hungarian / Russian / Swedish / Finnish light stemmers ------------------
# (the reference DEFAULT analyzers for these languages use Snowball
# stemmers, which this engine does not ship; the Light*StemFilter variants
# below are the reference's own alternatives — ``hu/HungarianLightStemFilter``,
# ``ru/RussianLightStemFilter``, ``sv/SwedishLightStemFilter``,
# ``fi/FinnishLightStemFilter`` — and are ported exactly.)

HUNGARIAN_STOP_WORDS = frozenset("""
a ahogy ahol aki akik akkor alatt által általában amely amelyek
amelyekben amelyeket amelyet amelynek ami amit amolyan amíg amikor át
abban ahhoz annak arra arról az azok azon azt azzal azért aztán azután
azonban bár be belül benne cikk cikkek cikkeket csak de e eddig egész
egy egyes egyetlen egyéb egyik egyre ekkor el elég ellen elő először
előtt első én éppen ebben ehhez emilyen ennek erre ez ezt ezek ezen
ezzel ezért és fel felé hanem hiszen hogy hogyan igen így illetve ill.
ill ilyen ilyenkor ison ismét itt jó jól jobban kell kellett keresztül
keressünk ki kívül között közül legalább lehet lehetett legyen lenne
lenni lesz lett maga magát majd majd már más másik meg még mellett mert
mely melyek mi mit míg miért milyen mikor minden mindent mindenki mindig
mint mintha mivel most nagy nagyobb nagyon ne néha nekem neki nem néhány
nélkül nincs olyan ott össze ő ők őket pedig persze rá s saját sem semmi
sok sokat sokkal számára szemben szerint szinte talán tehát teljes
tovább továbbá több úgy ugyanis új újabb újra után utána utolsó vagy
vagyis valaki valami valamint való vagyok van vannak volt voltam voltak
voltunk vissza vele viszont volna
""".split())

RUSSIAN_STOP_WORDS = frozenset("""
и в во не что он на я с со как а то все она так его но да ты к у же вы
за бы по только ее мне было вот от меня еще нет о из ему теперь когда
даже ну вдруг ли если уже или ни быть был него до вас нибудь опять уж
вам сказал ведь там потом себя ничего ей может они тут где есть надо ней
для мы тебя их чем была сам чтоб без будто человек чего раз тоже себе
под жизнь будет ж тогда кто этот говорил того потому этого какой совсем
ним здесь этом один почти мой тем чтобы нее кажется сейчас были куда
зачем сказать всех никогда сегодня можно при наконец два об другой хоть
после над больше тот через эти нас про всего них какая много разве
сказала три эту моя впрочем хорошо свою этой перед иногда лучше чуть том
нельзя такой им более всегда конечно всю между
""".split())

SWEDISH_STOP_WORDS = frozenset("""
och det att i en jag hon som han på den med var sig för så till är men
ett om hade de av icke mig du henne då sin nu har inte hans honom skulle
hennes där min man ej vid kunde något från ut när efter upp vi dem vara
vad över än dig kan sina här ha mot alla under någon eller allt mycket
sedan ju denna själv detta åt utan varit hur ingen mitt ni bli blev oss
din dessa några deras blir mina samma vilken er sådan vår blivit dess
inom mellan sådant varför varje vilka ditt vem vilket sitta sådana vart
dina vars vårt våra ert era vilkas
""".split())

FINNISH_STOP_WORDS = frozenset("""
olla olen olet on olemme olette ovat ole oli olisi olisit olisin
olisimme olisitte olisivat olit olin olimme olitte olivat ollut olleet
en et ei emme ette eivät minä minun minut minua minussa minusta minuun
minulla minulta minulle sinä sinun sinut sinua sinussa sinusta sinuun
sinulla sinulta sinulle hän hänen hänet häntä hänessä hänestä häneen
hänellä häneltä hänelle me meidän meidät meitä meissä meistä meihin
meillä meiltä meille te teidän teidät teitä teissä teistä teihin teillä
teiltä teille he heidän heidät heitä heissä heistä heihin heillä heiltä
heille tämä tämän tätä tässä tästä tähän tallä tältä tälle tänä täksi
tuo tuon tuotä tuossa tuosta tuohon tuolla tuolta tuolle tuona tuoksi se
sen sitä siinä siitä siihen sillä siltä sille sinä siksi nämä näiden
näitä näissä näistä näihin näillä näiltä näille näinä näiksi nuo noiden
noita noissa noista noihin noilla noilta noille noina noiksi ne niiden
niitä niissä niistä niihin niillä niiltä niille niinä niiksi kuka kenen
kenet ketä kenessä kenestä keneen kenellä keneltä kenelle kenenä keneksi
ketkä keiden ketkä keitä keissä keistä keihin keillä keiltä keille keinä
keiksi mikä minkä minkä mitä missä mistä mihin millä miltä mille minä
miksi mitkä joka jonka jota jossa josta johon jolla jolta jolle jona
joksi jotka joiden joita joissa joista joihin joilla joilta joille joina
joiksi että ja jos koska kuin mutta niin sekä sillä tai vaan vai vaikka
kanssa mukaan noin poikki yli kun niin nyt itse
""".split())

_HU_ACCENT = str.maketrans("áëéíóőõöúűũûü", "aeeioooouuuuu")
_HU_VOWEL = frozenset("aeiouy")


def _hu_remove_case(s: str) -> str:
    """HungarianLightStemmer.removeCase (:89-140), exact."""
    n = len(s)
    if n > 6 and s.endswith("kent"):
        return s[:-4]
    if n > 5:
        if s[-3:] in ("nak", "nek", "val", "vel", "ert", "rol", "ban",
                      "ben", "bol", "nal", "nel", "hoz", "hez", "tol"):
            return s[:-3]
        if s[-2:] in ("al", "el"):
            if s[-3] not in _HU_VOWEL and s[-3] == s[-4]:
                return s[:-3]
    if n > 4:
        if s[-2:] in ("at", "et", "ot", "va", "ve", "ra", "re", "ba",
                      "be", "ul", "ig"):
            return s[:-2]
        if s[-2:] in ("on", "en") and s[-3] not in _HU_VOWEL:
            return s[:-2]
        c = s[-1]
        if c in ("t", "n"):
            return s[:-1]
        if c in ("a", "e") and s[-2] == s[-3] and s[-2] not in _HU_VOWEL:
            return s[:-2]
    return s


def _hu_remove_possessive(s: str) -> str:
    """HungarianLightStemmer.removePossessive (:142-203), exact."""
    n = len(s)
    if n > 6:
        if s[-5] not in _HU_VOWEL and s[-4:] in ("atok", "otok", "etek"):
            return s[:-4]
        if s[-4:] in ("itek", "itok"):
            return s[:-4]
    if n > 5:
        if s[-4] not in _HU_VOWEL and s[-3:] in ("unk", "tok", "tek"):
            return s[:-3]
        if s[-4] in _HU_VOWEL and s[-3:] == "juk":
            return s[:-3]
        if s[-3:] == "ink":
            return s[:-3]
    if n > 4:
        if s[-3] not in _HU_VOWEL and s[-2:] in ("am", "em", "om", "ad",
                                                 "ed", "od", "uk"):
            return s[:-2]
        if s[-3] in _HU_VOWEL and s[-2:] in ("nk", "ja", "je"):
            return s[:-2]
        if s[-2:] in ("im", "id", "ik"):
            return s[:-2]
    if n > 3:
        c = s[-1]
        if c in ("a", "e"):
            if s[-2] not in _HU_VOWEL:
                return s[:-1]
        elif c in ("m", "d"):
            if s[-2] in _HU_VOWEL:
                return s[:-1]
        elif c == "i":
            return s[:-1]
    return s


def hungarian_light_stem(s: str) -> str:
    """``hu/HungarianLightStemmer.java`` (Savoy's UniNE algorithm), exact:
    accent fold, case-suffix removal, possessive removal, plural removal
    (with the a/o/e-k fallthrough), final-vowel normalization."""
    s = s.translate(_HU_ACCENT)
    s = _hu_remove_possessive(_hu_remove_case(s))
    if len(s) > 3 and s[-1] == "k":                 # removePlural
        s = s[:-2] if (s[-2] in "aoe" and len(s) > 4) else s[:-1]
    if len(s) > 3 and s[-1] in "aeio":              # normalize
        s = s[:-1]
    return s


def russian_light_stem(s: str) -> str:
    """``ru/RussianLightStemmer.java`` (Dolamic & Savoy, "Indexing and
    Searching Strategies for the Russian Language"), exact."""
    n = len(s)
    if n > 6 and s[-4:] in ("иями", "оями"):
        s = s[:-4]
    elif n > 5 and s[-3:] in (
            "иям", "иях", "оях", "ями", "оям", "оьв",
            "ами", "его", "ему", "ери", "ими", "ого",
            "ому", "ыми", "оев"):
        s = s[:-3]
    elif n > 4 and s[-2:] in (
            "ая", "яя", "ях", "юю", "ах", "ею", "их", "ия",
            "ию", "ьв", "ою", "ую", "ям", "ых", "ея", "ам",
            "ем", "ей", "ём", "ев", "ий", "им", "ое", "ой",
            "ом", "ов", "ые", "ый", "ым", "ми"):
        s = s[:-2]
    elif n > 3 and s[-1] in "аеиоуйыяь":
        s = s[:-1]
    n = len(s)
    if n > 3:                                       # normalize
        if s[-1] in ("ь", "и"):
            return s[:-1]
        if s[-1] == "н" and s[-2] == "н":
            return s[:-1]
    return s


def swedish_light_stem(s: str) -> str:
    """``sv/SwedishLightStemmer.java`` (Savoy, CLEF-2003), exact."""
    if len(s) > 4 and s[-1] == "s":
        s = s[:-1]
    n = len(s)
    if n > 7 and (s.endswith("elser") or s.endswith("heten")):
        return s[:-5]
    if n > 6 and s[-4:] in ("arne", "erna", "ande", "else", "aste",
                            "orna", "aren"):
        return s[:-4]
    if n > 5 and s[-3:] in ("are", "ast", "het"):
        return s[:-3]
    if n > 4 and s[-2:] in ("ar", "er", "or", "en", "at", "te", "et"):
        return s[:-2]
    if n > 3 and s[-1] in "taen":
        return s[:-1]
    return s


_FI_VOWEL = frozenset("aeiouy")
_FI_ACCENT = str.maketrans("äåö", "aao")


def _fi_step1(s: str) -> str:
    if len(s) > 8:
        if s.endswith("kin"):
            return _fi_step1(s[:-3])
        if s.endswith("ko"):
            return _fi_step1(s[:-2])
    if len(s) > 11:
        if s.endswith("dellinen"):
            return s[:-8]
        if s.endswith("dellisuus"):
            return s[:-9]
    return s


def _fi_step2(s: str) -> str:
    if len(s) > 5:
        if s[-3:] in ("lla", "tse", "sti"):
            return s[:-3]
        if s.endswith("ni"):
            return s[:-2]
        if s.endswith("aa"):
            return s[:-1]
    return s


def _fi_step3(s: str) -> str:
    n = len(s)
    if n > 8:
        if s.endswith("nnen"):
            return s[:-4] + "s"
        if s.endswith("ntena"):
            return s[:-5] + "s"
        if s.endswith("tten"):
            return s[:-4]
        if s.endswith("eiden"):
            return s[:-5]
    if n > 6:
        if s[-4:] in ("neen", "niin", "seen", "teen", "inen"):
            return s[:-4]
        if s[-3] == "h" and s[-2] in _FI_VOWEL and s[-1] == "n":
            return s[:-3]
        if s.endswith("den"):
            return s[:-3] + "s"
        if s.endswith("ksen"):
            return s[:-4] + "s"
        if s[-3:] in ("ssa", "sta", "lla", "lta", "tta", "ksi", "lle"):
            return s[:-3]
    if n > 5:
        if s[-2:] in ("na", "ne"):
            return s[:-2]
        if s.endswith("nei"):
            return s[:-3]
    if n > 4:
        if s[-2:] in ("ja", "ta"):
            return s[:-2]
        if s[-1] == "a":
            return s[:-1]
        if s[-1] == "n" and s[-2] in _FI_VOWEL:
            return s[:-2]
        if s[-1] == "n":
            return s[:-1]
    return s


def _fi_norm1(s: str) -> str:
    if len(s) > 5 and s.endswith("hde"):
        s = s[:-3] + "ksi"
    if len(s) > 4 and (s.endswith("ei") or s.endswith("at")):
        return s[:-2]
    if len(s) > 3 and s[-1] in "tsjeai":
        return s[:-1]
    return s


def _fi_norm2(s: str) -> str:
    if len(s) > 8 and s[-1] in "eou":
        s = s[:-1]
    if len(s) > 4:
        if s[-1] == "i":
            s = s[:-1]
        if len(s) > 4:
            # collapse doubled k/p/t anywhere (FinnishLightStemmer.norm2
            # :231-240 in-place delete with i-- semantics)
            buf = list(s)
            ch = buf[0]
            i = 1
            while i < len(buf):
                if buf[i] == ch and ch in "kpt":
                    del buf[i]
                else:
                    ch = buf[i]
                    i += 1
            s = "".join(buf)
    return s


def finnish_light_stem(s: str) -> str:
    """``fi/FinnishLightStemmer.java`` (Savoy, CLEF-2003), exact:
    recursive -kin/-ko clitic strip, case/possessive steps with the
    s-rewrites (nnen/ntena/den/ksen), and the kpt gemination collapse."""
    if len(s) < 4:
        return s
    s = s.translate(_FI_ACCENT)
    return _fi_norm2(_fi_norm1(_fi_step3(_fi_step2(_fi_step1(s)))))


def hungarian_light_analyze(text: str) -> list[Token]:
    """Standard -> LowerCase -> Stop(hungarian) -> HungarianLightStem."""
    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = term.lower()
        if t in HUNGARIAN_STOP_WORDS:
            continue
        out.append(Token(hungarian_light_stem(t), pos, start, end))
    return out


def russian_light_analyze(text: str) -> list[Token]:
    """Standard -> LowerCase -> Stop(russian) -> RussianLightStem."""
    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = term.lower()
        if t in RUSSIAN_STOP_WORDS:
            continue
        out.append(Token(russian_light_stem(t), pos, start, end))
    return out


def swedish_light_analyze(text: str) -> list[Token]:
    """Standard -> LowerCase -> Stop(swedish) -> SwedishLightStem."""
    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = term.lower()
        if t in SWEDISH_STOP_WORDS:
            continue
        out.append(Token(swedish_light_stem(t), pos, start, end))
    return out


def finnish_light_analyze(text: str) -> list[Token]:
    """Standard -> LowerCase -> Stop(finnish) -> FinnishLightStem."""
    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = term.lower()
        if t in FINNISH_STOP_WORDS:
            continue
        out.append(Token(finnish_light_stem(t), pos, start, end))
    return out



# -- German / French minimal stemmers ----------------------------------------

_DE_MIN_ACCENT = str.maketrans("äöü", "aou")


def german_minimal_stem(s: str) -> str:
    """``de/GermanMinimalStemmer.java`` (Savoy, "Morphologie et recherche
    d'information"), exact: umlaut fold, -nen, -en/-se/-es/-er, single
    final n/e/s/r."""
    if len(s) < 5:
        return s
    s = s.translate(_DE_MIN_ACCENT)
    n = len(s)
    if n > 6 and s.endswith("nen"):
        return s[:-3]
    if n > 5 and s[-2:] in ("en", "se", "es", "er"):
        return s[:-2]
    if s[-1] in "nesr":
        return s[:-1]
    return s


def french_minimal_stem(s: str) -> str:
    """``fr/FrenchMinimalStemmer.java`` (Savoy, "A stemming procedure and
    stopword list for general French corpora"), exact."""
    if len(s) < 6:
        return s
    if s[-1] == "x":
        if s[-3] == "a" and s[-2] == "u":
            return s[:-2] + "l"                 # -aux -> -al
        return s[:-1]
    if s[-1] == "s":
        s = s[:-1]
    if s[-1] == "r":
        s = s[:-1]
    if s[-1] == "e":
        s = s[:-1]
    if s[-1] == "é":
        s = s[:-1]
    if s[-1] == s[-2]:
        s = s[:-1]
    return s



# -- Arabic ------------------------------------------------------------------

ARABIC_STOP_WORDS = frozenset("""
من ومن منها منه في وفي فيها فيه و ف ثم او أو ب بها به ا أ اى اي أي أى لا
ولا الا ألا إلا لكن ما وما كما فما عن مع اذا إذا ان أن إن انها أنها إنها
انه أنه إنه بان بأن فان فأن وان وأن وإن التى التي الذى الذي الذين الى
الي إلى إلي على عليها عليه اما أما إما ايضا أيضا كل وكل لم ولم لن ولن هى
هي هو وهى وهي وهو فهى فهي فهو انت أنت لك لها له هذه هذا تلك ذلك هناك
كانت كان يكون تكون وكانت وكان غير بعض قد نحو بين بينما منذ ضمن حيث الان
الآن خلال بعد قبل حتى عند عندما لدى جميع
""".split())

_AR_ALEF, _AR_YEH, _AR_HEH, _AR_WAW = "ا", "ي", "ه", "و"
_AR_TEH_MARBUTA = "ة"
_AR_NORM_MAP = str.maketrans({
    "آ": _AR_ALEF, "أ": _AR_ALEF, "إ": _AR_ALEF,  # alef forms
    "ى": _AR_YEH,                                          # dotless yeh
    _AR_TEH_MARBUTA: _AR_HEH,                                  # teh marbuta
    "ـ": None,                                             # tatweel
    "ً": None, "ٌ": None, "ٍ": None,               # -atan
    "َ": None, "ُ": None, "ِ": None,               # harakat
    "ّ": None, "ْ": None,                              # shadda/sukun
})

_AR_PREFIXES = ["ال", "وال", "بال",
                "كال", "فال", "لل",
                "و"]
_AR_SUFFIXES = ["ها", "ان", "ات", "ون",
                "ين", "يه", "ية", "ه",
                "ة", "ي"]


def arabic_normalize(s: str) -> str:
    """``ar/ArabicNormalizer.java`` — alef variants to bare alef, dotless
    yeh to yeh, teh marbuta to heh, harakat/tanween/shadda/sukun/tatweel
    removed."""
    return s.translate(_AR_NORM_MAP)


def arabic_stem(s: str) -> str:
    """``ar/ArabicStemmer.java`` — strip ONE attached definite-article /
    conjunction / preposition prefix (waw alone needs a 4+ char word,
    others need 2 chars of stem left), then strip common suffixes in
    array order, each requiring 2 chars of stem to survive."""
    for p in _AR_PREFIXES:
        if len(p) == 1 and len(s) < 4:
            continue
        if len(p) > 1 and len(s) < len(p) + 2:
            continue
        if s.startswith(p):
            s = s[len(p):]
            break
    for suf in _AR_SUFFIXES:
        if len(s) >= len(suf) + 2 and s.endswith(suf):
            s = s[: -len(suf)]
    return s


def arabic_analyze(text: str) -> list[Token]:
    """ArabicAnalyzer.createComponents (:140-148): Standard -> LowerCase ->
    Stop(arabic) -> ArabicNormalization -> ArabicStem."""
    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = term.lower()
        if t in ARABIC_STOP_WORDS:
            continue
        out.append(Token(arabic_stem(arabic_normalize(t)), pos, start, end))
    return out


# -- Czech -------------------------------------------------------------------

CZECH_STOP_WORDS = frozenset("""
a s k o i u v z dnes cz tímto budeš budem byli jseš můj svým ta tomto
tohle tuto tyto jej zda proč máte tato kam tohoto kdo kteří mi nám tom
tomuto mít nic proto kterou byla toho protože asi ho naši napište re což
tím takže svých její svými jste aj tu tedy teto bylo kde ke pravé ji nad
nejsou či pod téma mezi přes ty pak vám ani když však neg jsem tento
článku články aby jsme před pta jejich byl ještě až bez také pouze první
vaše která nás nový tipy pokud může strana jeho své jiné zprávy nové
není vás jen podle zde už být více bude již než který by které co nebo
ten tak má při od po jsou jak další ale si se ve to jako za zpět ze do
pro je na atd atp jakmile přičemž já on ona ono oni ony my vy jí ji mě
mne jemu tomu těm těmu němu němuž jehož jíž jelikož jež jakož načež
""".split())


def _cz_remove_case(s: str) -> str:
    n = len(s)
    if n > 7 and s.endswith("atech"):
        return s[:-5]
    if n > 6 and s[-4:] in ("ětem", "etem", "atům"):
        return s[:-4]
    if n > 5 and s[-3:] in (
            "ech", "ich", "ích", "ého", "ěmi", "emi",
            "ému", "ěte", "ete", "ěti", "eti", "ího",
            "iho", "ími", "ímu", "imu", "ách", "ata", "aty",
            "ých", "ama", "ami", "ové", "ovi", "ými"):
        return s[:-3]
    if n > 4 and s[-2:] in (
            "em", "es", "ém", "ím", "ům", "at", "ám",
            "os", "us", "ým", "mi", "ou"):
        return s[:-2]
    if n > 3 and s[-1] in "aeiouůyáéíýě":
        return s[:-1]
    return s


def czech_stem(s: str) -> str:
    """``cz/CzechStemmer.java`` (Dolamic & Savoy light stemmer), exact:
    case-suffix removal, possessive -ov/-in/-uv removal, then palatal
    normalization (ct->ck, st->sk, c/č->k, z/ž->h, e-insertion
    collapse, ů->o)."""
    s = _cz_remove_case(s)
    if len(s) > 5 and s[-2:] in ("ov", "in", "ův"):
        s = s[:-2]
    if not s:
        return s
    if s.endswith("čt"):
        return s[:-2] + "ck"
    if s.endswith("št"):
        return s[:-2] + "sk"
    if s[-1] in ("c", "č"):
        return s[:-1] + "k"
    if s[-1] in ("z", "ž"):
        return s[:-1] + "h"
    if len(s) > 1 and s[-2] == "e":
        return s[:-2] + s[-1]
    if len(s) > 2 and s[-2] == "ů":
        return s[:-2] + "o" + s[-1]
    return s


def czech_analyze(text: str) -> list[Token]:
    """CzechAnalyzer: Standard -> LowerCase -> Stop(czech) -> CzechStem."""
    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = term.lower()
        if t in CZECH_STOP_WORDS:
            continue
        out.append(Token(czech_stem(t), pos, start, end))
    return out



# -- Norwegian (Bokmål / Nynorsk light + minimal stemmers) -------------------

def norwegian_light_stem(s: str, *, bokmaal: bool = True,
                         nynorsk: bool = False) -> str:
    """``no/NorwegianLightStemmer.java:85-175``, exact (flag-gated Bokmål
    and Nynorsk endings; genitive -s first, then one suffix pass)."""
    if len(s) > 4 and s[-1] == "s":
        s = s[:-1]
    n = len(s)
    if n > 7 and ((bokmaal and s[-5:] in ("heter", "heten"))
                  or (nynorsk and s.endswith("heita"))):
        return s[:-5]
    if n > 8 and nynorsk and s[-6:] in ("heiter", "leiken", "leikar"):
        return s[:-6]
    if n > 5 and (s.endswith("dom") or (bokmaal and s.endswith("het"))):
        return s[:-3]
    if n > 6 and nynorsk and s[-4:] in ("heit", "semd", "leik"):
        return s[:-4]
    if n > 7 and s[-5:] in ("elser", "elsen"):
        return s[:-5]
    if n > 6 and ((bokmaal and s[-4:] in ("ende", "este", "eren"))
                  or (nynorsk and s[-4:] in ("ande", "aste", "aren"))
                  or s.endswith("else")):
        return s[:-4]
    if n > 5 and ((bokmaal and s[-3:] in ("ere", "est"))
                  or (nynorsk and s[-3:] in ("are", "ast", "ane"))
                  or s.endswith("ene")):
        return s[:-3]
    if n > 4 and (s[-2:] in ("er", "en", "et", "te")
                  or (nynorsk and s.endswith("ar"))
                  or (bokmaal and s.endswith("st"))):
        return s[:-2]
    if n > 3 and s[-1] in "aen":
        return s[:-1]
    return s


def norwegian_minimal_stem(s: str, *, bokmaal: bool = True,
                           nynorsk: bool = False) -> str:
    """``no/NorwegianMinimalStemmer.java:82-110``, exact (plural forms and
    genitive -s only)."""
    if len(s) > 4 and s[-1] == "s":
        s = s[:-1]
    n = len(s)
    if n > 5 and (s.endswith("ene") or (nynorsk and s.endswith("ane"))):
        return s[:-3]
    if n > 4 and (s[-2:] in ("er", "en", "et")
                  or (nynorsk and s.endswith("ar"))):
        return s[:-2]
    if n > 3 and s[-1] in "ae":
        return s[:-1]
    return s


# -- Bulgarian ----------------------------------------------------------------

def _bg_remove_article(s: str) -> str:
    n = len(s)
    if n > 6 and s.endswith("ият"):
        return s[:-3]
    if n > 5 and s[-2:] in ("ът", "то", "те",
                            "та", "ия"):
        return s[:-2]
    if n > 4 and s.endswith("ят"):
        return s[:-2]
    return s


def _bg_remove_plural(s: str) -> str:
    n = len(s)
    if n > 6:
        if s.endswith("овци"):
            return s[:-3]
        if s.endswith("ове"):
            return s[:-3]
        if s.endswith("еве"):
            return s[:-3] + "й"
    if n > 5:
        if s.endswith("ища"):
            return s[:-3]
        if s.endswith("та"):
            return s[:-2]
        if s.endswith("ци"):
            return s[:-2] + "к"
        if s.endswith("зи"):
            return s[:-2] + "г"
        if s[-3] == "е" and s[-1] == "и":
            return s[:-3] + "я" + s[-2]
    if n > 4:
        if s.endswith("си"):
            return s[:-2] + "х"
        if s.endswith("и"):
            return s[:-1]
    return s


def bulgarian_stem(s: str) -> str:
    """``bg/BulgarianStemmer.java`` (the light stemmer of Nakov's
    BulStem / Savoy), exact: -ishta, definite article, plural (with the
    k/g/x palatalization recoveries), trailing vowels, en->n, and the
    fleeting-ъ removal."""
    if len(s) < 4:
        return s
    if len(s) > 5 and s.endswith("ища"):
        return s[:-3]
    s = _bg_remove_article(s)
    s = _bg_remove_plural(s)
    if len(s) > 3:
        if s.endswith("я"):
            s = s[:-1]
        if len(s) > 3 and s[-1] in ("а", "о", "е"):
            s = s[:-1]
    if len(s) > 4 and s.endswith("ен"):
        s = s[:-2] + "н"
    if len(s) > 5 and s[-2] == "ъ":
        s = s[:-2] + s[-1]
    return s


BULGARIAN_STOP_WORDS = frozenset()  # reference ships none in 4.x common


# -- Hindi --------------------------------------------------------------------

_HI_MAP = {
    "ँ": "ं",                                  # candrabindu
    "ऩ": "न", "ऱ": "र", "ऴ": "ळ",
    "क़": "क", "ख़": "ख", "ग़": "ग",
    "ज़": "ज", "ड़": "ड", "ढ़": "ढ",
    "फ़": "फ", "य़": "य",              # nukta forms
    "ॅ": "े", "ॆ": "े",              # chandra/short e
    "ॉ": "ो", "ॊ": "ो",
    "ऍ": "ए", "ऎ": "ए",
    "ऑ": "ओ", "ऒ": "ओ", "ॲ": "अ",
    "आ": "अ", "ई": "इ", "ऊ": "उ",  # long->short
    "ॠ": "ऋ", "ॡ": "ऌ",
    "ऐ": "ए", "औ": "ओ",
    "ी": "ि", "ू": "ु", "ॄ": "ृ",
    "ॣ": "ॢ", "ै": "े", "ौ": "ो",
}
_HI_DELETE = frozenset(["़", "‍", "‌", "्"])


def hindi_normalize(s: str) -> str:
    """``hi/HindiNormalizer.java`` (Ljiljana & Savoy orthographic
    normalization + Larkey's zwj/dead-n additions), exact: dead-n and
    candrabindu to anusvara, nukta form folding, zwj/zwnj/virama/nukta
    removal, chandra and long vowels to their short forms."""
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "न" and i + 1 < n and s[i + 1] == "्":
            out.append("ं")
            i += 2
            continue
        if c in _HI_DELETE:
            i += 1
            continue
        out.append(_HI_MAP.get(c, c))
        i += 1
    return "".join(out)


_HI_SUF_5 = ("ाएंगी", "ाएंगे",
             "ाऊंगी", "ाऊंगा",
             "ाइयाँ", "ाइयों",
             "ाइयां")
_HI_SUF_4 = ("ाएगी", "ाएगा",
             "ाओगी", "ाओगे",
             "एंगी", "ेंगी",
             "एंगे", "ेंगे",
             "ूंगी", "ूंगा",
             "ातीं", "नाओं",
             "नाएं", "ताओं",
             "ताएं", "ियाँ",
             "ियों", "ियां")
_HI_SUF_3 = ("ाकर", "ाइए", "ाईं",
             "ाया", "ेगी", "ेगा",
             "ोगी", "ोगे", "ाने",
             "ाना", "ाते", "ाती",
             "ाता", "तीं", "ाओं",
             "ाएं", "ुओं", "ुएं",
             "ुआं")
_HI_SUF_2 = ("कर", "ाओ", "िए", "ाई",
             "ाए", "ने", "नी", "ना",
             "ते", "ीं", "ती", "ता",
             "ाँ", "ां", "ों", "ें")
_HI_SUF_1 = ("ो", "े", "ू", "ु", "ी", "ि",
             "ा")


def hindi_stem(s: str) -> str:
    """``hi/HindiStemmer.java`` (Larkey's lightweight Hindi stemmer),
    exact: longest-first suffix strip with per-length word minimums."""
    n = len(s)
    if n > 6 and s[-5:] in _HI_SUF_5:
        return s[:-5]
    if n > 5 and s[-4:] in _HI_SUF_4:
        return s[:-4]
    if n > 4 and s[-3:] in _HI_SUF_3:
        return s[:-3]
    if n > 3 and s[-2:] in _HI_SUF_2:
        return s[:-2]
    if n > 2 and s[-1] in _HI_SUF_1:
        return s[:-1]
    return s


# -- Indonesian ---------------------------------------------------------------

_ID_VOWELS = frozenset("aeiou")


class _IndonesianState:
    __slots__ = ("syllables", "flags")


def indonesian_stem(s: str, derivational: bool = True) -> str:
    """``id/IndonesianStemmer.java`` (Asian, Williams & Tahaghoghi),
    exact: particle and possessive-pronoun removal, then (derivational)
    first-order prefix / suffix / second-order prefix with the
    prefix-suffix co-occurrence restrictions and the syllable floor."""
    st = _IndonesianState()
    st.flags = 0
    st.syllables = sum(1 for c in s if c in _ID_VOWELS)
    if st.syllables > 2:
        s = _id_particle(st, s)
    if st.syllables > 2:
        s = _id_possessive(st, s)
    if derivational:
        old = s
        if st.syllables > 2:
            s = _id_first_prefix(st, s)
        if s != old:
            old = s
            if st.syllables > 2:
                s = _id_suffix(st, s)
            if s != old and st.syllables > 2:
                s = _id_second_prefix(st, s)
        else:
            if st.syllables > 2:
                s = _id_second_prefix(st, s)
            if st.syllables > 2:
                s = _id_suffix(st, s)
    return s


_ID_KE, _ID_PENG, _ID_DI, _ID_MENG, _ID_TER, _ID_BER, _ID_PE = (
    1, 2, 4, 8, 16, 32, 64)


def _id_particle(st, s):
    if s.endswith(("kah", "lah", "pun")):
        st.syllables -= 1
        return s[:-3]
    return s


def _id_possessive(st, s):
    if s.endswith(("ku", "mu")):
        st.syllables -= 1
        return s[:-2]
    if s.endswith("nya"):
        st.syllables -= 1
        return s[:-3]
    return s


def _id_first_prefix(st, s):
    if s.startswith("meng"):
        st.flags |= _ID_MENG
        st.syllables -= 1
        return s[4:]
    if s.startswith("meny") and len(s) > 4 and s[4] in _ID_VOWELS:
        st.flags |= _ID_MENG
        st.syllables -= 1
        return "s" + s[4:]
    if s.startswith("men"):
        st.flags |= _ID_MENG
        st.syllables -= 1
        return s[3:]
    if s.startswith("mem"):
        st.flags |= _ID_MENG
        st.syllables -= 1
        return s[3:]
    if s.startswith("me"):
        st.flags |= _ID_MENG
        st.syllables -= 1
        return s[2:]
    if s.startswith("peng"):
        st.flags |= _ID_PENG
        st.syllables -= 1
        return s[4:]
    if s.startswith("peny") and len(s) > 4 and s[4] in _ID_VOWELS:
        st.flags |= _ID_PENG
        st.syllables -= 1
        return "s" + s[4:]
    if s.startswith("peny"):
        st.flags |= _ID_PENG
        st.syllables -= 1
        return s[4:]
    if s.startswith("pen") and len(s) > 3 and s[3] in _ID_VOWELS:
        st.flags |= _ID_PENG
        st.syllables -= 1
        return "t" + s[3:]
    if s.startswith("pen"):
        st.flags |= _ID_PENG
        st.syllables -= 1
        return s[3:]
    if s.startswith("pem"):
        st.flags |= _ID_PENG
        st.syllables -= 1
        return s[3:]
    if s.startswith("di"):
        st.flags |= _ID_DI
        st.syllables -= 1
        return s[2:]
    if s.startswith("ter"):
        st.flags |= _ID_TER
        st.syllables -= 1
        return s[3:]
    if s.startswith("ke"):
        st.flags |= _ID_KE
        st.syllables -= 1
        return s[2:]
    return s


def _id_second_prefix(st, s):
    if s.startswith("ber"):
        st.flags |= _ID_BER
        st.syllables -= 1
        return s[3:]
    if s == "belajar":
        st.flags |= _ID_BER
        st.syllables -= 1
        return s[3:]
    if (s.startswith("be") and len(s) > 4
            and s[2] not in _ID_VOWELS and s[3] == "e" and s[4] == "r"):
        st.flags |= _ID_BER
        st.syllables -= 1
        return s[2:]
    if s.startswith("per"):
        st.syllables -= 1
        return s[3:]
    if s == "pelajar":
        st.syllables -= 1
        return s[3:]
    if s.startswith("pe"):
        st.flags |= _ID_PE
        st.syllables -= 1
        return s[2:]
    return s


def _id_suffix(st, s):
    if (s.endswith("kan") and not st.flags & _ID_KE
            and not st.flags & _ID_PENG and not st.flags & _ID_PE):
        st.syllables -= 1
        return s[:-3]
    if (s.endswith("an") and not st.flags & _ID_DI
            and not st.flags & _ID_MENG and not st.flags & _ID_TER):
        st.syllables -= 1
        return s[:-2]
    if (s.endswith("i") and not s.endswith("si")
            and not st.flags & _ID_BER and not st.flags & _ID_KE
            and not st.flags & _ID_PENG):
        st.syllables -= 1
        return s[:-1]
    return s


# -- Persian / Turkish --------------------------------------------------------

_FA_MAP = {
    "ی": "ي", "ے": "ي",   # farsi yeh / yeh barree
    "ک": "ك",                       # keheh -> kaf
    "ۀ": "ه", "ہ": "ه",   # heh+yeh / heh goal -> heh
}


def persian_normalize(s: str) -> str:
    """``fa/PersianNormalizer.java`` — farsi yeh and yeh barree to arabic
    yeh, keheh to kaf, heh variants to heh, hamza-above removed."""
    return "".join(_FA_MAP.get(c, c) for c in s
                   if c != "ٔ")


def turkish_lowercase(s: str) -> str:
    """``tr/TurkishLowerCaseFilter.java:56-95`` — Turkish-aware lowering:
    capital I becomes dotless ı unless followed (through combining
    marks) by a combining dot above, in which case the dot is consumed and
    I becomes a regular i; composed İ lowers to plain i."""
    import unicodedata
    out = []
    i, n = 0, len(s)
    i_or_after = False
    while i < n:
        c = s[i]
        i_or_after = (c == "I") or (
            i_or_after and unicodedata.category(c) == "Mn")
        if i_or_after:
            if c == "̇":                 # combining dot above: consume
                i += 1
                continue
            if c == "I":
                j, before_dot = i + 1, False
                while j < n:
                    if unicodedata.category(s[j]) != "Mn":
                        break
                    if s[j] == "̇":
                        before_dot = True
                        break
                    j += 1
                out.append("i" if before_dot else "ı")
                if not before_dot:
                    i_or_after = False
                i += 1
                continue
        if c == "İ":                     # composed dotted capital I
            out.append("i")
        else:
            out.append(c.lower())
        i += 1
    return "".join(out)


def indonesian_analyze(text: str) -> list[Token]:
    """IndonesianAnalyzer: Standard -> LowerCase -> Stop(id) -> IndonesianStem
    (stop set omitted here: the reference loads it from stopwords.txt; we
    apply stemming on every token)."""
    return [Token(indonesian_stem(term.lower()), pos, start, end)
            for term, pos, start, end in standard_tokenize(text)]


def hindi_analyze(text: str) -> list[Token]:
    """HindiAnalyzer core chain: lowercase -> HindiNormalizer -> HindiStem
    (the reference also runs IndicNormalizationFilter for broken-encoding
    repair first — out of scope here and a no-op on well-formed text)."""
    return [Token(hindi_stem(hindi_normalize(term.lower())),
                  pos, start, end)
            for term, pos, start, end in standard_tokenize(text)]


def bulgarian_analyze(text: str) -> list[Token]:
    """BulgarianAnalyzer core chain: lowercase -> BulgarianStem."""
    return [Token(bulgarian_stem(term.lower()), pos, start, end)
            for term, pos, start, end in standard_tokenize(text)]



# -- Latvian ------------------------------------------------------------------

_LV_VOWELS = frozenset("aeiouāīēū")
# (affix, vowel-count-of-suffix, palatalizes) — tried in order;
# LatvianStemmer.java:41-67: fires when the word keeps > vc vowels and
# >= 3 chars of stem
_LV_AFFIXES = [
    ("ajiem", 3, False), ("ajai", 3, False), ("ajam", 2, False),
    ("ajām", 2, False), ("ajos", 2, False), ("ajās", 2, False),
    ("iem", 2, True), ("ajā", 2, False), ("ais", 2, False),
    ("ai", 2, False), ("ei", 2, False), ("ām", 1, False),
    ("am", 1, False), ("ēm", 1, False), ("īm", 1, False),
    ("im", 1, False), ("um", 1, False), ("us", 1, True),
    ("as", 1, False), ("ās", 1, False), ("es", 1, False),
    ("os", 1, True), ("ij", 1, False), ("īs", 1, False),
    ("ēs", 1, False), ("is", 1, False), ("ie", 1, False),
    ("u", 1, True), ("a", 1, True), ("i", 1, True),
    ("e", 1, False), ("ā", 1, False), ("ē", 1, False),
    ("ī", 1, False), ("ū", 1, False), ("o", 1, False),
    ("s", 0, False), ("š", 0, False),
]


def _lv_unpalatalize(s: str, removed_first: str) -> str:
    """LatvianStemmer.unpalatalize (:95-155): undo declension II/V/VI
    palatalization; the -u genitive-plural rules see the removed char."""
    if removed_first == "u":
        if s.endswith("kš"):
            return s[:-1] + "st"
        if s.endswith("ņņ"):
            return s[:-2] + "nn"
    if s.endswith(("pj", "bj", "mj", "vj")):
        return s[:-1]
    if s.endswith("šņ"):
        return s[:-2] + "sn"
    if s.endswith("žņ"):
        return s[:-2] + "zn"
    if s.endswith("šļ"):
        return s[:-2] + "sl"
    if s.endswith("žļ"):
        return s[:-2] + "zl"
    if s.endswith("ļņ"):
        return s[:-2] + "ln"
    if s.endswith("ļļ"):
        return s[:-2] + "ll"
    if s.endswith("č"):
        return s[:-1] + "c"
    if s.endswith("ļ"):
        return s[:-1] + "l"
    if s.endswith("ņ"):
        return s[:-1] + "n"
    return s


def latvian_stem(s: str) -> str:
    """``lv/LatvianStemmer.java`` (light stemmer: primary inflectional
    suffixes only), exact."""
    nv = sum(1 for c in s if c in _LV_VOWELS)
    for affix, vc, pal in _LV_AFFIXES:
        if nv > vc and len(s) >= len(affix) + 3 and s.endswith(affix):
            stem = s[: len(s) - len(affix)]
            return _lv_unpalatalize(stem, affix[0]) if pal else stem
    return s


def latvian_analyze(text: str) -> list[Token]:
    """LatvianAnalyzer core chain: Standard -> LowerCase -> LatvianStem."""
    return [Token(latvian_stem(term.lower()), pos, start, end)
            for term, pos, start, end in standard_tokenize(text)]



# -- Irish --------------------------------------------------------------------

IRISH_STOP_WORDS = frozenset("""
a ach ag agus an aon ar arna as b' ba beirt bhúr caoga ceathair ceathrar
chomh chtó chuig chun cois céad cúig cúigear d' daichead dar de deich
deichniúr den dhá do don dtí dá dár dó faoi faoin faoina faoinár fara
fiche gach gan go gur haon hocht i iad idir in ina ins inár is le leis
lena lenár m' mar mo mé na nach naoi naonúr ná ní níor nó nócha ocht
ochtar os roimh sa seacht seachtar seachtó seasca seisear siad sibh sinn
sna sé sí tar thar thú triúr trí trína trínár tríocha tú um ár é éis í ó
ón óna ónár
""".split())

_GA_UPPER_VOWELS = frozenset("AEIOUÁÉÍÓÚ")
IRISH_ARTICLES = frozenset(["d", "m", "b"])    # IrishAnalyzer.java:47-51
IRISH_HYPHENATIONS = frozenset(["h", "n", "t"])  # :58-62 (pre-elision stop)


def irish_lowercase(s: str) -> str:
    """``ga/IrishLowerCaseFilter.java:41-65`` — inserts the hyphen of
    t-prothesis / n-eclipsis ("nAthair" -> "n-athair") before lowering."""
    if len(s) > 1 and s[0] in ("n", "t") and s[1] in _GA_UPPER_VOWELS:
        return s[0] + "-" + s[1:].lower()
    return s.lower()


def irish_analyze(text: str) -> list[Token]:
    """IrishAnalyzer.createComponents (:136-148) minus the Snowball
    IrishStemmer (not shipped — documented non-goal): Standard ->
    Stop(hyphenation particles) -> Elision(d/m/b) -> IrishLowerCase ->
    Stop(irish).  The hyphenation stop runs BEFORE lowercasing (it
    removes the bare t/n/h particles StandardTokenizer splits off)."""
    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        if term in IRISH_HYPHENATIONS:
            continue
        t = irish_lowercase(elide(term, IRISH_ARTICLES))
        if not t or t in IRISH_STOP_WORDS:
            continue
        out.append(Token(t, pos, start, end))
    return out


# -- analyzer chains ----------------------------------------------------------

def english_kstem_analyze(text: str) -> list[Token]:
    """Standard -> possessive -> lowercase -> stop -> KStem (the Solr
    ``text_en`` variant that swaps PorterStemFilter for KStemFilter)."""
    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = _POSSESSIVE_RE.sub("", term).lower()
        if t in ENGLISH_STOP_WORDS:
            continue
        out.append(Token(kstem(t), pos, start, end))
    return out


def english_minimal_analyze(text: str) -> list[Token]:
    """Standard -> possessive -> lowercase -> stop -> S-stemmer."""
    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = _POSSESSIVE_RE.sub("", term).lower()
        if t in ENGLISH_STOP_WORDS:
            continue
        out.append(Token(english_minimal_stem(t), pos, start, end))
    return out


def french_analyze(text: str) -> list[Token]:
    """FrenchAnalyzer.createComponents (:139-148): Standard -> Elision ->
    LowerCase -> Stop(french) -> FrenchLightStem (positions keep holes)."""
    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = elide(term).lower()
        if not t or t in FRENCH_STOP_WORDS:
            continue
        out.append(Token(french_light_stem(t), pos, start, end))
    return out


def german_analyze(text: str) -> list[Token]:
    """GermanAnalyzer.createComponents (:136-146): Standard -> LowerCase ->
    Stop(german) -> GermanNormalization -> GermanLightStem.  The stop check
    runs on the lowercased term BEFORE normalization (the snowball stop set
    contains umlauts: für/über/während...); positions keep holes."""
    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = term.lower()
        if t in GERMAN_STOP_WORDS:
            continue
        out.append(Token(german_light_stem(german_normalize(t)),
                         pos, start, end))
    return out


def english_snowball_analyze(text: str) -> list[Token]:
    """SnowballAnalyzer("English"): Standard -> lowercase -> stop ->
    Porter2 (``org.tartarus.snowball.ext.EnglishStemmer``).  No
    possessive filter — Porter2's own step 0 strips 's/'s'/' (the
    reference chain relies on that too)."""
    from .porter2 import porter2_stem

    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = term.lower()
        if t in ENGLISH_STOP_WORDS:
            continue
        out.append(Token(porter2_stem(t), pos, start, end))
    return out




# ---------------------------------------------------------------------------
# Scandinavian Snowball analyzer chains (DanishAnalyzer / SwedishAnalyzer /
# NorwegianAnalyzer in the reference use SnowballFilter with these stop
# sets — resources/.../snowball/{danish,norwegian,swedish}_stop.txt)
# ---------------------------------------------------------------------------

DANISH_STOP_WORDS = frozenset("""
ad af alle alt anden at blev blive bliver da de dem den denne der
deres det dette dig din disse dog du efter eller en end er et for fra
ham han hans har havde have hende hendes her hos hun hvad hvis hvor i
ikke ind jeg jer jo kunne man mange med meget men mig min mine mit mod
ned noget nogle nu når og også om op os over på selv sig sin sine sit
skal skulle som sådan thi til ud under var vi vil ville vor være været
""".split())

NORWEGIAN_STOP_WORDS = frozenset("""
alle at av bare begge ble blei bli blir blitt både båe da de deg dei
deim deira deires dem den denne der dere deres det dette di din disse
ditt du dykk dykkar då eg ein eit eitt eller elles en enn er et ett
etter for fordi fra før ha hadde han hans har hennar henne hennes her
hjå ho hoe honom hoss hossen hun hva hvem hver hvilke hvilken hvis
hvor hvordan hvorfor i ikke ikkje ikkje ingen ingi inkje inn inni ja
jeg kan kom korleis korso kun kunne kva kvar kvarhelst kven kvi kvifor
man mange me med medan meg meget mellom men mi min mine mitt mot mykje
ned no noe noen noka noko nokon nokor nokre nå når og også om opp oss
over på samme seg selv si si sia sidan siden sin sine sitt sjøl skal
skulle slik so som som somme somt så sånn til um upp ut uten var vart
varte ved vere verte vi vil ville vore vors vort vår være være vært å
""".split())


def danish_analyze(text: str) -> list[Token]:
    """DanishAnalyzer: Standard -> LowerCase -> Stop(danish) -> Danish
    Snowball (bit-exact on all 23,829 reference vocabulary pairs)."""
    from .snowball import danish_snowball_stem

    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = term.lower()
        if t in DANISH_STOP_WORDS:
            continue
        out.append(Token(danish_snowball_stem(t), pos, start, end))
    return out


def swedish_snowball_analyze(text: str) -> list[Token]:
    """SwedishAnalyzer: Standard -> LowerCase -> Stop(swedish) -> Swedish
    Snowball (bit-exact on all 30,623 reference vocabulary pairs)."""
    from .snowball import swedish_snowball_stem

    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = term.lower()
        if t in SWEDISH_STOP_WORDS:
            continue
        out.append(Token(swedish_snowball_stem(t), pos, start, end))
    return out


def norwegian_snowball_analyze(text: str) -> list[Token]:
    """NorwegianAnalyzer: Standard -> LowerCase -> Stop(norwegian) ->
    Norwegian Snowball (bit-exact on all 20,628 reference pairs)."""
    from .snowball import norwegian_snowball_stem

    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = term.lower()
        if t in NORWEGIAN_STOP_WORDS:
            continue
        out.append(Token(norwegian_snowball_stem(t), pos, start, end))
    return out


DUTCH_STOP_WORDS = frozenset("""
aan al alles als altijd andere ben bij daar dan dat de der deze die
dit doch doen door dus een eens en er ge geen geweest haar had heb
hebben heeft hem het hier hij hoe hun iemand iets ik in is ja je kan
kon kunnen maar me meer men met mij mijn moet na naar niet niets nog
nu of om omdat onder ons ook op over reeds te tegen toch toen tot u
uit uw van veel voor want waren was wat werd wezen wie wil worden
wordt zal ze zelf zich zij zijn zo zonder zou
""".split())

# DutchAnalyzer.java:85-89 DEFAULT_STEM_DICT (StemmerOverrideFilter):
# words whose snowball stem would be wrong for retrieval
_DUTCH_STEM_OVERRIDES = {"fiets": "fiets", "bromfiets": "bromfiets",
                         "ei": "eier", "kind": "kinder"}


def dutch_analyze(text: str) -> list[Token]:
    """DutchAnalyzer: Standard -> LowerCase -> Stop(dutch) ->
    StemmerOverride(DEFAULT_STEM_DICT) -> Dutch Snowball (bit-exact on
    all 45,669 reference vocabulary pairs)."""
    from .snowball_nl import dutch_snowball_stem

    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = term.lower()
        if t in DUTCH_STOP_WORDS:
            continue
        if t in _DUTCH_STEM_OVERRIDES:
            out.append(Token(_DUTCH_STEM_OVERRIDES[t], pos, start, end))
        else:
            out.append(Token(dutch_snowball_stem(t), pos, start, end))
    return out


def russian_snowball_analyze(text: str) -> list[Token]:
    """RussianAnalyzer (default path): Standard -> LowerCase ->
    Stop(russian) -> Russian Snowball (bit-exact on all 49,673 reference
    vocabulary pairs)."""
    from .snowball_ru import russian_snowball_stem

    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = term.lower()
        if t in RUSSIAN_STOP_WORDS:
            continue
        out.append(Token(russian_snowball_stem(t), pos, start, end))
    return out


def spanish_snowball_analyze(text: str) -> list[Token]:
    """SpanishAnalyzer's SnowballFilter path: Standard -> LowerCase ->
    Stop(spanish) -> Spanish Snowball (bit-exact on all 28,390 reference
    vocabulary pairs)."""
    from .snowball_es import spanish_snowball_stem

    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = term.lower()
        if t in SPANISH_STOP_WORDS:
            continue
        out.append(Token(spanish_snowball_stem(t), pos, start, end))
    return out


def italian_snowball_analyze(text: str) -> list[Token]:
    """ItalianAnalyzer's SnowballFilter path: Standard -> Elision ->
    LowerCase -> Stop(italian) -> Italian Snowball (bit-exact on all
    35,494 reference vocabulary pairs)."""
    from .snowball_it import italian_snowball_stem

    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = elide(term, ITALIAN_ARTICLES).lower()
        if not t or t in ITALIAN_STOP_WORDS:
            continue
        out.append(Token(italian_snowball_stem(t), pos, start, end))
    return out


def portuguese_snowball_analyze(text: str) -> list[Token]:
    """PortugueseAnalyzer's SnowballFilter path: Standard -> LowerCase ->
    Stop(portuguese) -> Portuguese Snowball (bit-exact on all 32,016
    reference vocabulary pairs)."""
    from .snowball_pt import portuguese_snowball_stem

    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = term.lower()
        if t in PORTUGUESE_STOP_WORDS:
            continue
        out.append(Token(portuguese_snowball_stem(t), pos, start, end))
    return out


def german_snowball_analyze(text: str) -> list[Token]:
    """GermanAnalyzer's SnowballFilter path: Standard -> LowerCase ->
    Stop(german) -> German Snowball (bit-exact on all 35,033 reference
    vocabulary pairs; the ``german2`` ae/oe/ue-folding variant is
    exposed as ``snowball_de.german2_snowball_stem``)."""
    from .snowball_de import german_snowball_stem

    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = term.lower()
        if t in GERMAN_STOP_WORDS:
            continue
        out.append(Token(german_snowball_stem(t), pos, start, end))
    return out


ROMANIAN_STOP_WORDS = frozenset("""
acea aceasta această aceea acei aceia acel acela acele acelea acest
acesta aceste acestea aceşti aceştia acolo acum ai aia aibă aici al
ale alea altceva altcineva am ar are asemenea asta astea astăzi asupra
au avea avem aveţi azi aş aşadar aţi bine bucur bună ca care ce cel
ceva chiar cine cineva contra cu cum cumva curând curînd când cât câte
câtva câţi cînd cît cîte cîtva cîţi că căci cărei căror cărui către da
dacă dar datorită de deci deja deoarece departe deşi din dinaintea
dintr dintre drept după dă ea ei el ele eram este eu eşti face fi fie
fiecare fii fim fiţi fără iar ieri la le li lor lui lângă lîngă mea
mei mele mereu meu mi mine mult multă mulţi mâine mă ne nici nicăieri
nimeni nişte noastre noastră noi nostru noştri nu ori oricare orice
oricine oricum oricând oricât oricînd oricît oriunde pe pentru peste
poate pot prea prima primul prin printr până pînă sa sale sau se spre
sub sunt suntem sunteţi sînt sîntem sînteţi să săi său ta tale te tine
toate toată tot totuşi toţi tu tăi tău un una unde undeva unei unele
uneori unor vi voastre voastră voi vostru vouă voştri vreo vreun vă îi
îl îmi împotriva în înainte înaintea încotro încât încît între
întrucât întrucît îţi ăla ălea ăsta ăstea ăştia şi ţi ţie
""".split())


def romanian_analyze(text: str) -> list[Token]:
    """RomanianAnalyzer: Standard -> LowerCase -> Stop(romanian) ->
    Romanian Snowball (bit-exact on all 22,570 reference vocabulary
    pairs, cedilla forms)."""
    from .snowball_ro import romanian_snowball_stem

    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = term.lower()
        if t in ROMANIAN_STOP_WORDS:
            continue
        out.append(Token(romanian_snowball_stem(t), pos, start, end))
    return out


def french_snowball_analyze(text: str) -> list[Token]:
    """FrenchAnalyzer's SnowballFilter path (pre-3.1 default): Standard
    -> Elision -> LowerCase -> Stop(french) -> French Snowball
    (bit-exact on all 20,403 reference vocabulary pairs)."""
    from .snowball_fr import french_snowball_stem

    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = elide(term, FRENCH_ARTICLES).lower()
        if not t or t in FRENCH_STOP_WORDS:
            continue
        out.append(Token(french_snowball_stem(t), pos, start, end))
    return out


def finnish_snowball_analyze(text: str) -> list[Token]:
    """FinnishAnalyzer (default path): Standard -> LowerCase ->
    Stop(finnish) -> Finnish Snowball (bit-exact on all 50,000 reference
    vocabulary pairs)."""
    from .snowball_fi import finnish_snowball_stem

    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = term.lower()
        if t in FINNISH_STOP_WORDS:
            continue
        out.append(Token(finnish_snowball_stem(t), pos, start, end))
    return out


def hungarian_snowball_analyze(text: str) -> list[Token]:
    """HungarianAnalyzer (default path): Standard -> LowerCase ->
    Stop(hungarian) -> Hungarian Snowball (bit-exact on all 30,000
    reference vocabulary pairs)."""
    from .snowball_hu import hungarian_snowball_stem

    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = term.lower()
        if t in HUNGARIAN_STOP_WORDS:
            continue
        out.append(Token(hungarian_snowball_stem(t), pos, start, end))
    return out


TURKISH_STOP_WORDS = frozenset("""
acaba altmış altı ama ancak arada aslında ayrıca bana bazı belki ben
benden beni benim beri beş bile bin bir biri birkaç birkez birçok
birşey birşeyi biz bizden bize bizi bizim bu buna bunda bundan bunlar
bunları bunların bunu bunun burada böyle böylece da daha dahi de defa
değil diye diğer doksan dokuz dolayı dolayısıyla dört edecek eden
ederek edilecek ediliyor edilmesi ediyor elli en etmesi etti ettiği
ettiğini eğer gibi göre halen hangi hatta hem henüz hep hepsi her
herhangi herkesin hiç hiçbir iki ile ilgili ise itibaren itibariyle
için işte kadar karşın katrilyon kendi kendilerine kendini kendisi
kendisine kendisini kez ki kim kimden kime kimi kimse kırk milyar
milyon mu mü mı nasıl ne neden nedenle nerde nerede nereye niye niçin
o olan olarak oldu olduklarını olduğu olduğunu olmadı olmadığı olmak
olması olmayan olmaz olsa olsun olup olur olursa oluyor on ona ondan
onlar onlardan onları onların onu onun otuz oysa pek rağmen sadece
sanki sekiz seksen sen senden seni senin siz sizden sizi sizin
tarafından trilyon tüm var vardı ve veya ya yani yapacak yapmak yaptı
yaptıkları yaptığı yaptığını yapılan yapılması yapıyor yedi yerine
yetmiş yine yirmi yoksa yüz zaten çok çünkü öyle üzere üç şey şeyden
şeyi şeyler şu şuna şunda şundan şunları şunu şöyle
""".split())


def turkish_analyze(text: str) -> list[Token]:
    """TurkishAnalyzer: Standard -> TurkishLowerCase (dotted/dotless i)
    -> Stop(turkish) -> Turkish Snowball (bit-exact on all 96,325
    reference vocabulary pairs)."""
    from .snowball_tr import turkish_snowball_stem

    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = turkish_lowercase(term)
        if t in TURKISH_STOP_WORDS:
            continue
        out.append(Token(turkish_snowball_stem(t), pos, start, end))
    return out


def _register():
    from .tokenizer import register_analyzer

    register_analyzer("english_kstem", english_kstem_analyze)
    register_analyzer("english_snowball", english_snowball_analyze)
    register_analyzer("english_minimal", english_minimal_analyze)
    register_analyzer("french", french_analyze)
    register_analyzer("german", german_analyze)
    register_analyzer("spanish", spanish_analyze)
    register_analyzer("italian", italian_analyze)
    register_analyzer("portuguese", portuguese_analyze)
    register_analyzer("hungarian_light", hungarian_light_analyze)
    register_analyzer("russian_light", russian_light_analyze)
    register_analyzer("swedish_light", swedish_light_analyze)
    register_analyzer("finnish_light", finnish_light_analyze)
    register_analyzer("arabic", arabic_analyze)
    register_analyzer("czech", czech_analyze)
    register_analyzer("indonesian", indonesian_analyze)
    register_analyzer("hindi", hindi_analyze)
    register_analyzer("bulgarian", bulgarian_analyze)
    register_analyzer("latvian", latvian_analyze)
    register_analyzer("irish", irish_analyze)
    register_analyzer("danish", danish_analyze)
    register_analyzer("swedish_snowball", swedish_snowball_analyze)
    register_analyzer("norwegian_snowball", norwegian_snowball_analyze)
    register_analyzer("dutch", dutch_analyze)
    register_analyzer("russian_snowball", russian_snowball_analyze)
    register_analyzer("spanish_snowball", spanish_snowball_analyze)
    register_analyzer("italian_snowball", italian_snowball_analyze)
    register_analyzer("portuguese_snowball", portuguese_snowball_analyze)
    register_analyzer("german_snowball", german_snowball_analyze)
    register_analyzer("romanian", romanian_analyze)
    register_analyzer("french_snowball", french_snowball_analyze)
    register_analyzer("finnish_snowball", finnish_snowball_analyze)
    register_analyzer("hungarian_snowball", hungarian_snowball_analyze)
    register_analyzer("turkish", turkish_analyze)


_register()
