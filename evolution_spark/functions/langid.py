"""Character-trigram language identification — the missing language
dimension of the quality-signal set (real corpus curation always
filters on language before anything else).

Model: per-language profiles of the TOP-K character trigrams of a
deterministic seed text, weighted by frequency rank (w = K - rank).
A document's score for language L is the rank-weight sum of its
trigrams that appear in L's profile; the prediction is the max-score
language (ties break lexicographically). Integer weights end to end,
so scores are hash-stable across engines.

Seed texts are AUTHORED IN-REPO for this module (pangram-flavored
sentences, one per language, all lowercase, no apostrophes so they
embed in SQL literals) — license-clean by construction, checked in as
the model weights the classifier derives from. This is a compact
n-gram classifier in the family of Cavnar & Trenkle (1994)
"N-Gram-Based Text Categorization" — rank-profile matching — not a
port of any implementation.

Scale shape: the profile table is ~800 rows (broadcast); classifying
a corpus is explode-trigrams -> broadcast join -> one (doc_id, lang)
aggregate -> per-doc argmax window. Document text shuffles once,
keyed by doc_id, as trigram rows; everything is Spark built-ins
(whole-stage codegen), no UDFs.

Ref parity: the reference has no text analysis (extension surface).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

K = 64  # trigrams kept per language profile

SEED_TEXTS = {
    "ca": "la guineu marró ràpida salta sobre el gos mandrós i els nens"
          " caminen cada matí amb els seus amics cap a la escola perquè"
          " llegir llibres junts fa que els llargs vespres de hivern"
          " siguin càlids i lluminosos"
          " la gent diu sovint que el bon menjar i els mercats oberts reuneixen tota la ciutat durant la festa de estiu",
    "cs": "rychlá hnědá liška skáče přes líného psa a děti chodí každé"
          " ráno se svými přáteli do školy protože společné čtení knih"
          " dělá dlouhé zimní večery teplé a jasné"
          " lidé často říkají že dobré jídlo a otevřené trhy spojují celé město během letní slavnosti",
    "da": "den hurtige brune ræv springer over den dovne hund og"
          " børnene går hver morgen med deres venner i skole fordi det"
          " at læse bøger sammen gør de lange vinteraftener varme og"
          " lyse"
          " folk siger ofte at god mad og åbne markeder samler hele byen under sommerfesten",
    "de": "der schnelle braune fuchs springt über den faulen hund und"
          " die kinder gehen jeden morgen mit ihren freunden zur schule"
          " weil das gemeinsame lesen von büchern die langen"
          " winterabende warm und hell macht"
          " die leute sagen oft dass gutes essen und offene märkte die ganze stadt während des sommerfestes zusammenbringen",
    "en": "the quick brown fox jumps over the lazy dog and the children"
          " walk to school every morning with their friends because"
          " reading books together makes the long winter evenings feel"
          " warm and bright"
          " people often say that good food and open markets bring the whole town together during the summer festival",
    "es": "el zorro marrón veloz salta sobre el perro perezoso y los"
          " niños caminan cada mañana con sus amigos hacia la escuela"
          " porque leer libros juntos hace que las largas tardes de"
          " invierno sean cálidas"
          " la gente dice a menudo que la buena comida y los mercados abiertos reúnen a toda la ciudad durante la fiesta del verano",
    "fi": "nopea ruskea kettu hyppää laiskan koiran yli ja lapset"
          " kävelevät joka aamu ystäviensä kanssa kouluun koska"
          " kirjojen lukeminen yhdessä tekee pitkistä talvi illoista"
          " lämpimiä ja valoisia"
          " ihmiset sanovat usein että hyvä ruoka ja avoimet torit kokoavat koko kaupungin yhteen kesäjuhlien aikana",
    "fr": "le renard brun rapide saute par dessus le chien paresseux et"
          " les enfants vont chaque matin avec leurs amis vers la"
          " petite école parce que lire des livres ensemble rend les"
          " longues soirées de hiver si douces"
          " les gens disent souvent que la bonne nourriture et les marchés ouverts rassemblent toute la ville pendant la fête de été",
    "hu": "a gyors barna róka átugorja a lusta kutyát és a gyerekek"
          " minden reggel a barátaikkal sétálnak az iskolába mert a"
          " közös olvasás meleggé és fényessé teszi a hosszú téli"
          " estéket"
          " az emberek gyakran mondják hogy a jó étel és a nyitott piacok összehozzák az egész várost a nyári ünnep alatt",
    "id": "rubah coklat yang cepat melompati anjing malas dan anak anak"
          " berjalan setiap pagi bersama teman teman mereka ke sekolah"
          " karena membaca buku bersama membuat malam musim dingin"
          " yang panjang terasa hangat"
          " orang orang sering berkata bahwa makanan enak dan pasar terbuka menyatukan seluruh kota selama pesta musim panas",
    "it": "la volpe marrone veloce salta sopra il cane pigro e i"
          " bambini camminano ogni mattina con i loro amici verso la"
          " scuola perché leggere libri insieme rende calde le lunghe"
          " serate di inverno"
          " la gente dice spesso che il buon cibo e i mercati aperti riuniscono tutta la città durante la festa di estate",
    "nl": "de snelle bruine vos springt over de luie hond en de"
          " kinderen lopen elke ochtend met hun vrienden naar school"
          " omdat samen boeken lezen de lange winteravonden warm en"
          " helder maakt"
          " de mensen zeggen vaak dat goed eten en open markten de hele stad samenbrengen tijdens het zomerfeest",
    "no": "den raske brune reven hopper over den late hunden og barna"
          " går hver morgen med vennene sine til skolen fordi det å"
          " lese bøker sammen gjør de lange vinterkveldene varme og"
          " lyse"
          " folk sier ofte at god mat og åpne markeder bringer hele byen sammen under sommerfesten i august",
    "pl": "szybki brązowy lis skacze nad leniwym psem a dzieci idą"
          " każdego ranka ze swoimi przyjaciółmi do szkoły ponieważ"
          " wspólne czytanie książek sprawia że długie zimowe wieczory"
          " są ciepłe i jasne"
          " ludzie często mówią że dobre jedzenie i otwarte targi łączą całe miasto podczas letniego święta",
    "pt": "a raposa marrom veloz salta sobre o cão preguiçoso e as"
          " crianças caminham todas as manhãs com os seus amigos para"
          " a escola porque ler livros juntos torna quentes as longas"
          " noites de inverno"
          " as pessoas dizem muitas vezes que a boa comida e os mercados abertos reúnem toda a cidade durante a festa do verão",
    "ro": "vulpea maro rapidă sare peste câinele leneș iar copiii merg"
          " în fiecare dimineață cu prietenii lor la școală pentru că"
          " cititul cărților împreună face serile lungi de iarnă calde"
          " și luminoase"
          " oamenii spun adesea că mâncarea bună și piețele deschise adună întreg orașul în timpul serbării de vară",
    "sv": "den snabba bruna räven hoppar över den lata hunden och"
          " barnen går varje morgon med sina vänner till skolan"
          " eftersom att läsa böcker tillsammans gör de långa"
          " vinterkvällarna varma och ljusa"
          " folk säger ofta att god mat och öppna marknader för samman hela staden under sommarfesten",
    "sw": "mbweha mwepesi wa kahawia anaruka juu ya mbwa mvivu na"
          " watoto wanatembea kila asubuhi na marafiki zao kwenda"
          " shuleni kwa sababu kusoma vitabu pamoja hufanya jioni"
          " ndefu za baridi kuwa na joto"
          " watu husema mara nyingi kwamba chakula kizuri na masoko ya wazi huleta mji mzima pamoja wakati wa sikukuu ya kiangazi",
    "tr": "hızlı kahverengi tilki tembel köpeğin üzerinden atlar ve"
          " çocuklar her sabah arkadaşları ile okula yürür çünkü"
          " birlikte kitap okumak uzun kış akşamlarını sıcak ve"
          " aydınlık yapar"
          " insanlar sık sık iyi yemeğin ve açık pazarların yaz şenliği sırasında bütün şehri bir araya getirdiğini söyler",
    "vi": "con cáo nâu nhanh nhẹn nhảy qua con chó lười biếng và trẻ em"
          " đi bộ đến trường mỗi buổi sáng cùng bạn bè vì đọc sách"
          " cùng nhau làm cho những buổi tối mùa đông dài trở nên ấm"
          " áp"
          " mọi người thường nói rằng thức ăn ngon và những phiên chợ mở làm cho cả thành phố gần nhau hơn trong lễ hội mùa hè",
}


def _normalize(s: str) -> str:
    import re

    return re.sub(r"\s+", " ", s.lower()).strip()


def _trigrams(s: str) -> list[str]:
    s = _normalize(s)
    return [s[i: i + 3] for i in range(len(s) - 2)]


def build_profiles(k: int = K) -> dict[str, dict[str, int]]:
    """{lang: {trigram: weight}} — top-k trigrams of each seed text by
    (count desc, trigram asc), weight = k - rank. Pure function of the
    checked-in seed texts: THE model weights."""
    out = {}
    for lang, text in SEED_TEXTS.items():
        counts: dict[str, int] = {}
        for t in _trigrams(text):
            counts[t] = counts.get(t, 0) + 1
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[lang] = {t: k - r for r, (t, _) in enumerate(top)}
    return out


PROFILES = build_profiles()


def profile_rows() -> list[tuple[str, str, int]]:
    """Flat (lang, trigram, weight) rows — the broadcast side of the
    classification join, and the VALUES table a SQL oracle embeds."""
    return sorted(
        (lang, tri, w)
        for lang, prof in PROFILES.items()
        for tri, w in prof.items()
    )


def classify_language(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """(id, text) -> (id, lang, score): explode normalized char
    trigrams, broadcast-join the profile table, sum rank weights per
    (id, lang), keep each id's argmax (score desc, lang asc).
    Documents with NO profile trigram at all yield no row (no signal
    -> no claim)."""
    spark = df.sparkSession
    prof = F.broadcast(spark.createDataFrame(
        profile_rows(), "lang string, tri string, w int"
    ))
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)),
                                   "\\s+", " "))
    tri = (
        df.select(F.col(id_col), norm.alias("__t"))
        .select(
            id_col,
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(length(__t) - 2,"
                    " 0)), i -> substring(__t, i, 3))"
                )
            ).alias("tri"),
        )
    )
    scored = (
        tri.join(prof, "tri")
        .groupBy(id_col, "lang")
        .agg(F.sum("w").alias("score"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("lang").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(id_col, F.col("lang").alias("pred_lang"), "score")
    )
