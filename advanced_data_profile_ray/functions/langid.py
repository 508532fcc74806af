"""Heuristic language identification (no model files in this container —
FastText lid.176 is stubbed by a deterministic script+stopword heuristic).

Mirrors the reference's behavior shape (detect_language_with_confidence,
Profiler.py:231-259): pure-Latin text short-circuits to English with
confidence 100, non-Latin scripts are classified by Unicode block, and
Latin-script text is scored against small stopword profiles. Returns
(language, confidence%) like the reference.
"""

from __future__ import annotations

import re

# Unicode-block regexes (compiled once at import; stage actors reuse them)
SCRIPT_PATTERNS = [
    ("Russian", re.compile(r"[Ѐ-ӿ]")),
    ("Chinese", re.compile(r"[一-鿿㐀-䶿]")),
    ("Japanese", re.compile(r"[぀-ヿ]")),
    ("Korean", re.compile(r"[가-힯ᄀ-ᇿ]")),
    ("Arabic", re.compile(r"[؀-ۿ]")),
    ("Hebrew", re.compile(r"[֐-׿]")),
    ("Greek", re.compile(r"[Ͱ-Ͽ]")),
    ("Hindi", re.compile(r"[ऀ-ॿ]")),
    ("Thai", re.compile(r"[฀-๿]")),
]

NON_ASCII_RE = re.compile(r"[^\x00-\x7F]")
TOKEN_RE = re.compile(r"[a-zà-ÿäöüßñç]+", re.IGNORECASE)

STOPWORDS = {
    "English": {"the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "as", "on", "at", "this"},
    "Spanish": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "las", "por", "con", "para", "es", "del"},
    "French": {"le", "la", "les", "de", "des", "et", "un", "une", "du", "que", "est", "pour", "dans", "qui", "sur"},
    "German": {"der", "die", "das", "und", "ist", "von", "mit", "den", "des", "ein", "eine", "nicht", "auf", "für", "im"},
    "Italian": {"il", "la", "di", "che", "e", "un", "una", "per", "con", "del", "della", "non", "sono", "nel", "alla"},
    "Portuguese": {"o", "a", "de", "que", "e", "do", "da", "em", "um", "uma", "para", "com", "os", "as", "não"},
}


def load_fasttext_model(model_path: str | None = None):
    """MODEL SWAP POINT (Profiler.py:85-91): returns a fastText lid.176
    model when the library AND weight file are available, else None.
    ``LangIdStage.__init__`` calls this once per actor/worker — dropping
    the real model into a container with ``fasttext`` installed and
    ``FASTTEXT_LID_PATH`` (or the default path) present upgrades every
    language-ID pipeline with zero code changes; this container has
    neither, so the deterministic heuristic below stands in."""
    import os

    path = model_path or os.environ.get("FASTTEXT_LID_PATH", "lid.176.ftz")
    try:
        import fasttext  # not in this container

        if os.path.exists(path):
            return fasttext.load_model(path)
    except ImportError:
        pass
    return None


def detect_language_fasttext(model, text: str) -> tuple[str, float]:
    """fastText prediction in the same (language, confidence%) shape as
    detect_language; reference maps ISO codes via pycountry
    (Profiler.py:246-252) — here the raw __label__ code is surfaced."""
    labels, probs = model.predict(text.replace("\n", " "))
    if not labels:
        return ("English", 100.0)
    return (labels[0].replace("__label__", ""), round(float(probs[0]) * 100.0, 2))


def detect_language(text: str) -> tuple[str, float]:
    """(language, confidence%) for one document."""
    if not text:
        return ("English", 100.0)
    non_ascii = NON_ASCII_RE.findall(text)
    if not non_ascii:
        # pure-Latin short-circuit, like the reference — but still try to
        # tell Latin languages apart by stopwords when evidence is strong
        lang, conf = _latin_stopword_vote(text)
        return (lang, conf)
    # script vote over non-ASCII chars
    sample = "".join(non_ascii[:512])
    best, best_n = None, 0
    for lang, pat in SCRIPT_PATTERNS:
        n = len(pat.findall(sample))
        if n > best_n:
            best, best_n = lang, n
    if best is not None:
        conf = round(100.0 * best_n / max(1, len(sample)), 2)
        return (best, conf)
    lang, conf = _latin_stopword_vote(text)
    return (lang, conf)


def _latin_stopword_vote(text: str) -> tuple[str, float]:
    toks = TOKEN_RE.findall(text.lower())
    if not toks:
        return ("English", 100.0)
    scores = {
        lang: sum(t in sw for t in toks) / len(toks)
        for lang, sw in STOPWORDS.items()
    }
    lang = max(sorted(scores), key=lambda k: scores[k])
    if scores[lang] == 0.0:
        return ("English", 100.0)  # no evidence → reference default
    return (lang, round(min(100.0, 40.0 + 200.0 * scores[lang]), 2))
