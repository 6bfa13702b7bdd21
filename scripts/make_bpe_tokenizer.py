"""Train a local byte-level BPE tokenizer with production-like statistics.

VERDICT r4 next #4: the round-4 spec/prefix measurements rode the hermetic
ByteTokenizer, which spends ~4x the tokens of real BPE on the same text —
prompt lengths, shared-prefix lengths, and n-gram acceptance all shift
under a word-level tokenizer. The real Qwen tokenizer FILES cannot be
fetched (zero egress), so this builds the honest stand-in: a byte-level
BPE (the same algorithm family as Qwen's) trained on real English (the
repo's documentation) plus a large sample of the bench corpus generator's
output (bench/pipeline_bench.py page_text — the text the measurements
actually tokenize), wrapped as an HF tokenizer dir that the existing
`HFTokenizer` (inference/tokenizer.py:26) loads unchanged.

Usage: python scripts/make_bpe_tokenizer.py [outdir] [vocab_size]
Default outdir runs/bpe_tokenizer, vocab 32000.
"""

import glob
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SPECIALS = ["<|endoftext|>", "<|im_start|>", "<|im_end|>",
            "<|vision_start|>", "<|vision_end|>", "<|image_pad|>"]


def build_corpus() -> list[str]:
    texts = []
    # real English: the repo's own documentation + docstrings
    for pattern in ("*.md", "karanta_tpu/**/*.py", "scripts/*.py"):
        for path in glob.glob(os.path.join(REPO, pattern), recursive=True):
            try:
                with open(path, encoding="utf-8") as f:
                    texts.append(f.read())
            except OSError:
                continue
    # the bench corpus distribution (common-English word soup)
    from karanta_tpu.bench.pipeline_bench import page_text

    for seed in range(2000):
        texts.append(page_text(seed, n_lines=40))
    # digits/punctuation so numeric content doesn't fall back to bytes
    texts.append(" ".join(str(i) for i in range(3000)))
    return texts


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(REPO, "runs", "bpe_tokenizer")
    vocab_size = int(sys.argv[2]) if len(sys.argv) > 2 else 32_000

    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE(unk_token=None))
    # ByteLevel with the GPT-2/Qwen regex-free default: every byte
    # representable, merges learned over whitespace-prefixed words
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size, special_tokens=SPECIALS,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False)
    tok.train_from_iterator(build_corpus(), trainer)

    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        eos_token="<|im_end|>",
        pad_token="<|endoftext|>",
        additional_special_tokens=SPECIALS[3:],
    )
    os.makedirs(outdir, exist_ok=True)
    fast.save_pretrained(outdir)

    # smoke: loadable through the serving tokenizer, sane statistics
    from karanta_tpu.inference.tokenizer import HFTokenizer
    from karanta_tpu.bench.pipeline_bench import page_text

    h = HFTokenizer(outdir)
    sample = page_text(0, n_lines=10)
    n_words = len(sample.split())
    n_tokens = len(h.encode(sample))
    assert h.image_pad_id >= 0 and h.eos_token_id >= 0
    print(f"saved {outdir}: vocab={fast.vocab_size} "
          f"tokens/word={n_tokens / n_words:.2f} "
          f"(bytes/word={len(sample) / n_words:.2f}) "
          f"image_pad_id={h.image_pad_id} eos={h.eos_token_id}")


if __name__ == "__main__":
    main()
