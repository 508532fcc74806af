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


FASTTEXT_MAGIC = 793712314  # FASTTEXT_FILEFORMAT_MAGIC_INT32 (public format)


class NumpyFastTextModel:
    """Pure-numpy inference over an UNQUANTIZED supervised fastText
    ``.bin`` (public file format: magic+version header, Args block,
    Dictionary block, dense input/output matrices). Supports the
    word-feature softmax subset (wordNgrams=1, no subword buckets) —
    enough to run a distilled/word-level language-ID model in containers
    where the fasttext lib can't install; the quantized ``.ftz`` and
    subword models still need the real library (first branch of
    ``load_fasttext_model``).

    ``predict`` mirrors the fasttext API shape: a single string returns
    (labels_tuple, probs_array); a list of strings returns parallel
    lists — exactly what ``LangIdStage.__call__`` batch-consumes."""

    def __init__(self, labels: list, vocab: dict, input_mat, output_mat):
        import numpy as np

        self.labels = labels
        self.vocab = vocab  # word -> input-matrix row
        self.input = np.asarray(input_mat, dtype=np.float32)
        self.output = np.asarray(output_mat, dtype=np.float32)

    def _predict_one(self, text: str, k: int):
        import numpy as np

        ids = [self.vocab[w] for w in text.split() if w in self.vocab]
        # real fastText appends EOS to every supervised input line — the
        # hidden average must include it or probabilities diverge from
        # the fasttext library on the identical model file
        if "</s>" in self.vocab:
            ids.append(self.vocab["</s>"])
        if not ids:
            return (), np.array([], dtype=np.float32)
        hidden = self.input[ids].mean(axis=0)
        scores = self.output @ hidden
        scores -= scores.max()
        probs = np.exp(scores)
        probs /= probs.sum()
        order = np.argsort(-probs, kind="stable")[:k]
        return (tuple(self.labels[i] for i in order),
                probs[order].astype(np.float32))

    def predict(self, text, k: int = 1):
        if isinstance(text, str):
            return self._predict_one(text, k)
        pairs = [self._predict_one(t, k) for t in text]
        return [p[0] for p in pairs], [p[1] for p in pairs]


def _load_fasttext_bin(path: str) -> NumpyFastTextModel:
    """Minimal reader for the public fastText ``.bin`` layout (see
    fastText's fasttext.cc/args.cc/dictionary.cc/densematrix.cc save
    functions): int32 magic+version; Args = 12×int32 + 1×double;
    Dictionary = size/nwords/nlabels int32, ntokens/pruneidx_size int64,
    then per entry NUL-terminated word + int64 count + int8 type
    (0=word, 1=label), then pruneidx int32 pairs; int8 quant flags
    around two int64-shaped float32 dense matrices. Raises ValueError
    on quantized/subword/n-gram models this reader doesn't cover."""
    import struct

    import numpy as np

    with open(path, "rb") as f:
        magic, _version = struct.unpack("<ii", f.read(8))
        if magic != FASTTEXT_MAGIC:
            raise ValueError(f"{path}: not a fastText .bin (magic {magic})")
        (dim, _ws, _epoch, _minCount, _neg, wordNgrams, loss, model,
         bucket, minn, maxn, _lr) = struct.unpack("<12i", f.read(48))
        (_t,) = struct.unpack("<d", f.read(8))
        if wordNgrams != 1 or bucket != 0 or minn != 0 or maxn != 0:
            raise ValueError(
                "NumpyFastTextModel covers the word-feature subset only "
                f"(wordNgrams={wordNgrams}, bucket={bucket}, minn={minn}, "
                f"maxn={maxn}) — install fasttext for this model")
        # loss_name {hs=1, ns=2, softmax=3}; model_name {cbow=1, sg=2,
        # sup=3}: only flat-softmax supervised scoring is implemented —
        # silently softmaxing an hs/ns model would return wrong labels
        if loss != 3 or model != 3:
            raise ValueError(
                f"NumpyFastTextModel scores softmax supervised models only "
                f"(loss={loss}, model={model}) — install fasttext")
        size, nwords, _nlabels = struct.unpack("<3i", f.read(12))
        _ntokens, prune_n = struct.unpack("<2q", f.read(16))
        vocab, labels = {}, []
        for i in range(size):
            chars = bytearray()
            while (c := f.read(1)) != b"\x00":
                if not c:  # EOF mid-entry: truncated/corrupt file
                    raise ValueError(f"{path}: truncated dictionary entry")
                chars += c
            _count, etype = struct.unpack("<qb", f.read(9))
            word = chars.decode("utf-8")
            if etype == 0:
                vocab[word] = i
            else:
                labels.append(word)
        # UNPRUNED dictionaries (the normal case) save pruneidx_size_ = -1;
        # a negative read(count) would slurp to EOF and break the next unpack
        f.read(8 * max(0, prune_n))
        (quant_in,) = struct.unpack("<b", f.read(1))
        if quant_in:
            raise ValueError("quantized .ftz needs the fasttext library")
        m, n = struct.unpack("<2q", f.read(16))
        if n != dim:
            raise ValueError(f"input matrix cols {n} != dim {dim}")
        input_mat = np.frombuffer(f.read(4 * m * n),
                                  dtype=np.float32).reshape(m, n)
        (quant_out,) = struct.unpack("<b", f.read(1))
        if quant_out:
            raise ValueError("quantized output matrix needs fasttext")
        mo, no = struct.unpack("<2q", f.read(16))
        output_mat = np.frombuffer(f.read(4 * mo * no),
                                   dtype=np.float32).reshape(mo, no)
    # word rows live in the first nwords input rows; ids beyond nwords
    # are n-gram buckets (excluded by the subset check above)
    vocab = {w: i for w, i in vocab.items() if i < nwords}
    return NumpyFastTextModel(labels, vocab, input_mat, output_mat)


def load_fasttext_model(model_path: str | None = None):
    """MODEL SWAP POINT (Profiler.py:85-91): returns a fastText lid.176
    model when the library AND weight file are available; when only the
    weight file is present, an UNQUANTIZED word-level supervised .bin
    loads through the pure-numpy reader above; else None.
    ``LangIdStage.__init__`` calls this once per actor/worker — dropping
    the real model into a container with ``fasttext`` installed and
    ``FASTTEXT_LID_PATH`` (or the default path) present upgrades every
    language-ID pipeline with zero code changes; without both, the
    deterministic heuristic below stands in."""
    import os

    path = model_path or os.environ.get("FASTTEXT_LID_PATH", "lid.176.ftz")
    if not os.path.exists(path):
        return None
    try:
        import fasttext  # not in this container

        return fasttext.load_model(path)
    except ImportError:
        pass
    import struct

    try:
        return _load_fasttext_bin(path)
    except (ValueError, struct.error):  # unsupported subset / corrupt file
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
