"""Offline acceptance simulation for the n-gram speculative drafter.

Question (ROADMAP item: "Speculative decoding on real pages"): what
acceptance rate does the engine's trailing-bigram drafter
(inference/engine.py:_spec_chunk_impl) achieve on realistic OCR text?
The bench's synthetic pages measured no gain because random-weight decode
output has no n-gram repeats; real OCR transcripts DO repeat — above all
because the pipeline prompt embeds the page's anchor text (the PDF text
layer, reference pipeline.py build_page_query), which the transcript then
largely reproduces. That makes OCR the textbook prompt-lookup case.

This script replays the drafter EXACTLY (most recent earlier occurrence of
the trailing bigram in the slot history, draft the following gamma tokens,
accept the longest exact prefix that matches the true continuation) over
real English prose from the image (GPL/LICENSE texts — the only sizeable
English prose available offline), in three settings:

  anchored   — history starts with an OCR-noised copy of the page text
               (anchor), then the transcript grows (the pipeline setting)
  scanned    — history starts empty (no text layer: scanned page)
  digits     — random digit pages (the closed-loop corpus; control)

Token granularities: word-level (proxy for BPE: one token ~ one word /
punct) and byte-level (the hermetic ByteTokenizer). True BPE sits between.

Output: mean accepted drafts per step (alpha), tokens/step = 1 + alpha,
by setting x granularity x gamma.
"""

from __future__ import annotations

import glob
import random
import re


def load_prose(max_chars: int = 400_000) -> str:
    texts = []
    for path in sorted(glob.glob("/usr/share/common-licenses/*")):
        try:
            with open(path, encoding="utf-8", errors="ignore") as f:
                texts.append(f.read())
        except OSError:
            continue
    with open("/opt/skills/guides/pallas_guide.md", encoding="utf-8",
              errors="ignore") as f:
        texts.append(f.read())
    return "\n\n".join(texts)[:max_chars]


def word_tokens(text: str) -> list[str]:
    return re.findall(r"\w+|[^\w\s]", text)


def byte_tokens(text: str) -> list[int]:
    return list(text.encode("utf-8"))


def make_pages(corpus_tokens: list, page_len: int, n_pages: int,
               rng: random.Random) -> list[list]:
    pages = []
    for _ in range(n_pages):
        start = rng.randrange(0, len(corpus_tokens) - page_len)
        pages.append(corpus_tokens[start:start + page_len])
    return pages


def noise_anchor(page: list, rng: random.Random, drop: float = 0.08,
                 swap: float = 0.02) -> list:
    """OCR-noise the text layer: drop ~8% tokens, corrupt ~2% (the anchor is
    the PDF's own text layer — imperfect but mostly the page text)."""
    out = []
    for t in page:
        r = rng.random()
        if r < drop:
            continue
        if r < drop + swap:
            out.append(t if not isinstance(t, int) else (t + 1) % 256)
            continue
        out.append(t)
    return out


def run_drafter(history: list, transcript: list, gamma: int):
    """Replay _spec_chunk_impl's drafter: per emitted step, find the most
    recent earlier occurrence of the trailing bigram of (history +
    transcript-so-far), draft the next gamma tokens from that point, accept
    the longest exact-matching prefix vs the true continuation."""
    hist = list(history)
    # bigram -> (most recent, previous) positions of the bigram's FIRST token
    last_pos: dict[tuple, int] = {}
    prev_pos: dict[tuple, int] = {}

    def record(p: int) -> None:
        key = (hist[p], hist[p + 1])
        if key in last_pos:
            prev_pos[key] = last_pos[key]
        last_pos[key] = p

    for i in range(len(hist) - 1):
        record(i)
    steps = 0
    emitted = 0
    i = 0  # next transcript token to emit
    while i < len(transcript):
        steps += 1
        # the true next token is always emitted (verifier output)
        new = 1
        if len(hist) >= 2:
            key = (hist[-2], hist[-1])
            pos = last_pos.get(key)
            if pos == len(hist) - 2:  # the trailing bigram itself
                pos = prev_pos.get(key)
            if pos is not None:
                draft = hist[pos + 2: pos + 2 + gamma]
                truth = transcript[i: i + len(draft)]
                for d, t in zip(draft, truth):
                    if d != t:
                        break
                    new += 1
        new = min(new, len(transcript) - i)
        for k in range(new):
            hist.append(transcript[i + k])
            if len(hist) >= 2:
                record(len(hist) - 2)
        i += new
        emitted += new
    return emitted, steps


def main():
    rng = random.Random(0)
    prose = load_prose()
    gammas = (3, 5, 7)
    n_pages = 40

    for gran, tok in (("word", word_tokens), ("byte", byte_tokens)):
        corpus = tok(prose)
        # transcript budget ~ a dense page: 700 words / 3500 bytes
        page_len = 700 if gran == "word" else 3500
        pages = make_pages(corpus, page_len, n_pages, rng)
        for setting in ("anchored", "scanned", "digits"):
            for gamma in gammas:
                tot_e = tot_s = 0
                for page in pages:
                    if setting == "digits":
                        page = [rng.choice("0123456789") for _ in range(64)] \
                            if gran == "word" else \
                            [rng.randrange(48, 58) for _ in range(64)]
                        history = []
                    elif setting == "anchored":
                        history = noise_anchor(page, rng)
                    else:
                        history = []
                    e, s = run_drafter(history, page, gamma)
                    tot_e += e
                    tot_s += s
                tps = tot_e / tot_s
                print(f"{gran:5s} {setting:9s} gamma={gamma}: "
                      f"tokens/step={tps:.3f} (alpha={tps - 1:.3f})")


if __name__ == "__main__":
    main()
