"""Deterministic synthetic per-language corpora (seed-stable, no external data).

Used by BOTH the model-training scripts (models/train_models.py — langid
weights, LM count tables) and the fixture generator (fixtures/gen.py).
Everything is a pure function of (lang, seed/index): regenerating on any
machine yields identical bytes.

Vocabularies are small frozen lists of real common words per language so
char-n-gram language ID has a realistic signal; content is otherwise
synthetic (SURVEY.md §0: no external data may be shipped or fetched).
"""

from __future__ import annotations

import random

from . import spec

# ---------------------------------------------------------------------------
# Frozen per-language vocabularies: stopwords (spec.STOPWORDS) + content words.
# ---------------------------------------------------------------------------

_CONTENT_WORDS: dict[str, tuple[str, ...]] = {
    "en": tuple(
        """house water time people world school family morning evening market
        street garden window letter question answer story mountain river light
        music friend father mother children teacher doctor winter summer night
        city village bridge forest animal flower weather journey language country
        history science number problem moment silence kitchen picture measure
        together different important beautiful possible national general little
        company business service report change public work life hand part place
        week year month point government system program group number fact""".split()
    ),
    "de": tuple(
        """haus wasser zeit leute welt schule familie morgen abend markt strasse
        garten fenster brief frage antwort geschichte berg fluss licht musik
        freund vater mutter kinder lehrer arzt winter sommer nacht stadt dorf
        bruecke wald tier blume wetter reise sprache land geschichte wissenschaft
        zahl problem augenblick stille kueche bild zusammen verschieden wichtig
        schoen moeglich staatlich allgemein klein gesellschaft arbeit leben hand
        teil ort woche jahr monat punkt regierung gruppe mensch frau mann tag
        heute immer wieder ueber unter zwischen waehrend gegen ohne durch""".split()
    ),
    "fr": tuple(
        """maison eau temps gens monde ecole famille matin soir marche rue jardin
        fenetre lettre question reponse histoire montagne riviere lumiere musique
        ami pere mere enfants professeur medecin hiver ete nuit ville village
        pont foret animal fleur voyage langue pays science nombre probleme moment
        silence cuisine image ensemble different important beau possible national
        general petit entreprise travail vie main partie lieu semaine annee mois
        point gouvernement groupe femme homme jour aujourd toujours encore depuis
        pendant contre sans avant apres chaque autre meme aussi bien tres""".split()
    ),
    "es": tuple(
        """casa agua tiempo gente mundo escuela familia manana tarde mercado
        calle jardin ventana carta pregunta respuesta historia montana lumbre
        musica amigo padre madre ninos maestro medico invierno verano noche
        ciudad pueblo puente bosque animal flor viaje lengua pais ciencia numero
        problema momento silencio cocina imagen juntos diferente importante
        hermoso posible nacional general pequeno empresa trabajo vida mano parte
        lugar semana ano mes punto gobierno grupo mujer hombre dia hoy siempre
        todavia desde durante contra antes despues cada otro mismo tambien""".split()
    ),
    "zh": tuple(
        """房子 水 时间 人们 世界 学校 家庭 早上 晚上 市场 街道 花园 窗户 信件 问题
        回答 故事 山 河 光 音乐 朋友 父亲 母亲 孩子 老师 医生 冬天 夏天 夜晚 城市
        村庄 桥 森林 动物 花 天气 旅行 语言 国家 历史 科学 数字 时刻 安静 厨房
        图片 一起 不同 重要 美丽 可能 国家 一般 小 公司 工作 生活 手 部分 地方
        星期 年 月 点 政府 系统 群 事实 女人 男人 今天 总是 还 从 期间 反对""".split()
    ),
}


def vocab(lang: str) -> list[str]:
    """Frozen LM/generator vocabulary for `lang`: stopwords then content words."""
    return sorted(spec.STOPWORDS[lang]) + list(_CONTENT_WORDS[lang])


def _pick(rng: random.Random, words: list[str], nstop: int) -> str:
    # Zipf-ish mixture: ~45% stopwords, else content word by index-biased draw.
    if rng.random() < 0.45:
        return words[rng.randrange(nstop)]
    i = nstop + int(rng.random() ** 1.7 * (len(words) - nstop))
    return words[min(i, len(words) - 1)]


def sentence(rng: random.Random, lang: str, words: list[str] | None = None) -> str:
    """One clean sentence: 8–20 vocab words, capitalized, terminal '.'."""
    ws = words if words is not None else vocab(lang)
    nstop = len(spec.STOPWORDS[lang])
    n = rng.randint(8, 20)
    toks = [_pick(rng, ws, nstop) for _ in range(n)]
    if lang == "zh":
        # pre-segmented (space-separated) words, CJK full stop
        return " ".join(toks) + " 。"
    s = " ".join(toks)
    return s[0].upper() + s[1:] + "."


def clean_doc(rng: random.Random, lang: str, min_sentences: int = 5, max_sentences: int = 30) -> str:
    """A clean multi-paragraph document that passes every §2.9 gate."""
    ws = vocab(lang)
    n = rng.randint(min_sentences, max_sentences)
    sents = [sentence(rng, lang, ws) for _ in range(n)]
    # paragraph breaks every 3-6 sentences
    lines: list[str] = []
    buf: list[str] = []
    per = rng.randint(3, 6)
    for s in sents:
        buf.append(s)
        if len(buf) >= per:
            lines.append(" ".join(buf))
            buf = []
            per = rng.randint(3, 6)
    if buf:
        lines.append(" ".join(buf))
    return "\n".join(lines)


def gibberish_doc(rng: random.Random, n_words: int = 120) -> str:
    """High-perplexity, no-language word salad (random ascii letter strings)."""
    letters = "abcdefghijklmnopqrstuvwxyz"
    out = []
    for i in range(n_words):
        w = "".join(rng.choice(letters) for _ in range(rng.randint(3, 9)))
        out.append(w)
        if (i + 1) % 12 == 0:
            out.append("\n")
    sents = " ".join(out).replace(" \n ", "\n")
    return sents + "."


def training_corpus(lang: str, n_docs: int, seed: int = 42) -> list[str]:
    """Deterministic clean training docs for the langid / LM models.

    Seeded per (lang, index) so the corpus is independent of generation
    order and parallelism.
    """
    base = spec.fnv1a64(f"train:{lang}:{seed}".encode())
    return [
        clean_doc(random.Random(base ^ spec.fnv1a64(str(i).encode())), lang)
        for i in range(n_docs)
    ]
