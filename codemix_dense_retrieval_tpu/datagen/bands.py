"""Code-mix band generation (word-mix data).

Replaces `generate_cm_bands.py` (#8). The reference drives an OpenAI
model per (EN, ZH) query pair, measures the realized ZH-share with the
mix counter, and files candidates into whichever band they actually land
in (opportunistic), retrying with an adaptive candidate count; output is
one ``queries-cm<L>-<H>.tsv`` per band plus ``qids-common.tsv``
(`generate_cm_bands.py:370-487,704-729`).

The generation backend is injectable (``generate_fn``): the OpenAI
implementation is provided (gated on the ``openai`` package and an API
key), and tests inject a deterministic synthesizer — the banding,
measurement, opportunistic filing, resume, and artifact logic is the
framework's and fully testable offline.
"""

from __future__ import annotations

import pathlib
import threading
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

from codemix_dense_retrieval_tpu.datagen.mix_count import mix_ratio
from codemix_dense_retrieval_tpu.io.tsv import read_queries_tsv
from codemix_dense_retrieval_tpu.utils.logging import get_logger

log = get_logger("bands")

DEFAULT_BANDS: Tuple[Tuple[int, int], ...] = ((0, 20), (20, 40), (40, 60), (60, 80), (80, 100))

# generate_fn(en_text, zh_text, target_ratios, k) -> candidate strings
GenerateFn = Callable[[str, str, Sequence[float], int], List[str]]


def band_of(ratio: float, bands: Sequence[Tuple[int, int]]) -> Optional[Tuple[int, int]]:
    """Find the band containing ratio; upper bound inclusive only for the
    last band (reference band semantics)."""
    for i, (lo, hi) in enumerate(bands):
        last = i == len(bands) - 1
        if lo <= ratio < hi or (last and ratio == hi):
            return (lo, hi)
    return None


def band_filename(band: Tuple[int, int]) -> str:
    return f"queries-cm{band[0]}-{band[1]}.tsv"


@dataclass
class BandState:
    """Per-band collected rows, resumable from existing band files."""

    bands: Tuple[Tuple[int, int], ...]
    rows: Dict[Tuple[int, int], Dict[str, str]] = field(default_factory=dict)

    def __post_init__(self) -> None:
        for b in self.bands:
            self.rows.setdefault(b, {})

    @classmethod
    def resume(cls, outdir, bands: Sequence[Tuple[int, int]] = DEFAULT_BANDS) -> "BandState":
        state = cls(tuple(bands))
        outdir = pathlib.Path(outdir)
        for b in state.bands:
            path = outdir / band_filename(b)
            if path.exists():
                for qid, text in read_queries_tsv(path):
                    state.rows[b][qid] = text
        return state

    def missing_bands(self, qid: str) -> List[Tuple[int, int]]:
        return [b for b in self.bands if qid not in self.rows[b]]

    def file_candidate(self, qid: str, text: str, ratio: float) -> Optional[Tuple[int, int]]:
        """Opportunistic filing: the candidate lands in its ACTUAL band if
        that band is still missing for this qid (reference `:430-470`)."""
        band = band_of(ratio, self.bands)
        if band is None:
            return None
        if qid in self.rows[band]:
            return None
        self.rows[band][qid] = text
        return band

    def common_qids(self) -> List[str]:
        """qids present in EVERY band (reference `:704-729`)."""
        sets = [set(r) for r in self.rows.values()]
        common = set.intersection(*sets) if sets else set()
        return sorted(common, key=lambda q: (len(q), q))

    def write(self, outdir) -> None:
        outdir = pathlib.Path(outdir)
        outdir.mkdir(parents=True, exist_ok=True)
        for band, rows in self.rows.items():
            path = outdir / band_filename(band)
            lines = [f"{qid}\t{text}" for qid, text in sorted(rows.items())]
            path.write_text("\n".join(lines) + ("\n" if lines else ""), encoding="utf-8")
        common = self.common_qids()
        (outdir / "qids-common.tsv").write_text(
            "\n".join(common) + ("\n" if common else ""), encoding="utf-8"
        )


def adaptive_k(attempt: int, base_k: int = 3, max_k: int = 10) -> int:
    """Candidate count grows with retries (reference `:146-171`)."""
    return min(base_k * (attempt + 1), max_k)


def generate_bands_for_pair(
    qid: str,
    en_text: str,
    zh_text: str,
    state: BandState,
    generate_fn: GenerateFn,
    *,
    lang_a: str = "en",
    lang_b: str = "zh",
    max_attempts: int = 3,
    classifier=None,
) -> int:
    """Process one query pair: generate candidates for all missing bands,
    measure, file opportunistically, retry with larger K. Returns the
    number of newly filled bands. Endpoint bands can always be satisfied
    by the monolingual texts themselves."""
    filled = 0
    # endpoints: pure EN (ratio 0) and pure ZH (ratio 100) when bands cover them
    for text in (en_text, zh_text):
        ratio = mix_ratio(text, lang_a, lang_b, classifier)
        if ratio is not None and state.file_candidate(qid, text, ratio) is not None:
            filled += 1
    for attempt in range(max_attempts):
        missing = state.missing_bands(qid)
        if not missing:
            break
        targets = [(lo + hi) / 2.0 for lo, hi in missing]
        k = adaptive_k(attempt)
        candidates = generate_fn(en_text, zh_text, targets, k)
        for cand in candidates:
            ratio = mix_ratio(cand, lang_a, lang_b, classifier)
            if ratio is None:
                continue
            if state.file_candidate(qid, cand, ratio) is not None:
                filled += 1
    return filled


def generate_band_dataset(
    pairs: Sequence[Tuple[str, str, str]],  # (qid, en_text, zh_text)
    outdir,
    generate_fn: GenerateFn,
    *,
    bands: Sequence[Tuple[int, int]] = DEFAULT_BANDS,
    lang_a: str = "en",
    lang_b: str = "zh",
    max_attempts: int = 3,
    num_threads: int = 1,
    classifier=None,
    checkpoint_every: int = 50,
) -> BandState:
    """Full dataset generation with resume + periodic checkpointing."""
    outdir = pathlib.Path(outdir)
    state = BandState.resume(outdir, bands)
    lock = threading.Lock()
    processed = 0

    def work(item):
        nonlocal processed
        qid, en_text, zh_text = item
        with lock:
            if not state.missing_bands(qid):
                return
        generate_bands_for_pair(
            qid, en_text, zh_text, state, generate_fn,
            lang_a=lang_a, lang_b=lang_b, max_attempts=max_attempts,
            classifier=classifier,
        )
        with lock:
            processed += 1
            if processed % checkpoint_every == 0:
                state.write(outdir)

    if num_threads > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(num_threads) as pool:
            list(pool.map(work, pairs))
    else:
        for item in pairs:
            work(item)
    state.write(outdir)
    return state


class UsageTracker:
    """Token/cost accounting across generator calls (the reference keeps
    running cost totals, `generate_cm_bands.py:364-365,433-434`)."""

    def __init__(self, prompt_usd_per_1m: float = 0.0, completion_usd_per_1m: float = 0.0):
        self.prompt_tokens = 0
        self.completion_tokens = 0
        self.calls = 0
        self._pp = prompt_usd_per_1m
        self._cp = completion_usd_per_1m

    def add(self, usage) -> None:
        self.calls += 1
        if usage is None:
            return
        self.prompt_tokens += getattr(usage, "prompt_tokens", 0) or 0
        self.completion_tokens += getattr(usage, "completion_tokens", 0) or 0

    @property
    def cost_usd(self) -> float:
        return (
            self.prompt_tokens * self._pp + self.completion_tokens * self._cp
        ) / 1_000_000

    def summary(self) -> dict:
        return {
            "calls": self.calls,
            "prompt_tokens": self.prompt_tokens,
            "completion_tokens": self.completion_tokens,
            "cost_usd": round(self.cost_usd, 4),
        }


def openai_generate_fn(
    model: str = "gpt-5-mini",
    api_key: Optional[str] = None,
    usage: Optional[UsageTracker] = None,
) -> GenerateFn:
    """OpenAI-backed candidate generator (host-side; requires network +
    the ``openai`` package — mirrors the reference's prompt contract,
    `generate_cm_bands.py:173-217`). Pass a ``UsageTracker`` to accumulate
    token counts / cost."""
    from openai import OpenAI  # gated import

    client = OpenAI(api_key=api_key)

    def generate(en_text: str, zh_text: str, targets: Sequence[float], k: int) -> List[str]:
        target_desc = ", ".join(f"{t:.0f}%" for t in targets)
        prompt = (
            "You create code-switched (Chinese-English mixed) versions of a query.\n"
            f"English: {en_text}\nChinese: {zh_text}\n"
            f"Produce {k} natural mixed versions for EACH of these Chinese-word "
            f"percentages: {target_desc}. Keep the meaning identical. "
            "Return one query per line, no numbering."
        )
        resp = client.chat.completions.create(
            model=model, messages=[{"role": "user", "content": prompt}]
        )
        if usage is not None:
            usage.add(getattr(resp, "usage", None))
        text = resp.choices[0].message.content or ""
        return [line.strip() for line in text.splitlines() if line.strip()]

    return generate
