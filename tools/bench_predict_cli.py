#!/usr/bin/env python3
"""Measures the PRODUCTION predict CLI's own TPU RTF (VERDICT r4 weak #5 /
item 7): the real `allophant predict` command — checkpoint restore, corpus
loading, per-language composition decoders, batch pipeline, JSONL writing to a
real file — on the flagship model over a synthetic UCLA-format corpus of
10-second utterances.

bench.py's all-heads/beam serving loops are bench-internal stand-ins
(fabricated records to /dev/null); this tool records the shipped code path's
number next to them. Two corpus sizes are timed in one process; the marginal
RTF ((audio2-audio1)/(t2-t1)) cancels restore + compile startup and measures
the steady-state hot loop, while end_to_end_rtf reports the full command
including startup.

Usage: python tools/bench_predict_cli.py [utterances_per_language=128]
(~10 min on one v5e chip; most of it flagship checkpoint save/restore).
Prints one JSON line. Recorded in ARCHITECTURE.md / README serving tables.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import wave

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "allophant_tpu_xla"),
)
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import numpy as np

SECONDS = 10.0
BATCH = 128


def write_ucla_corpus(root: str, inventories: dict, utterances_per_language: int, rng) -> float:
    """UCLA-format corpus of fixed 10 s noise utterances; returns audio seconds."""
    samples = int(16_000 * SECONDS)
    total_seconds = 0.0
    for language, inventory in inventories.items():
        base = os.path.join(root, language)
        os.makedirs(os.path.join(base, "audio"), exist_ok=True)
        with open(os.path.join(base, "inventory"), "w", encoding="utf-8") as file:
            for phoneme in inventory:
                file.write(f"{phoneme} 5\n")
        with (
            open(os.path.join(base, "raw"), "w", encoding="utf-8") as raw,
            open(os.path.join(base, "text"), "w", encoding="utf-8") as text,
        ):
            for index in range(utterances_per_language):
                utterance = f"{language}_{index}"
                raw.write(f"{utterance} rawform\n")
                labels = rng.choice(inventory, size=8)
                text.write(f"{utterance} {' '.join(labels)}\n")
                audio = rng.uniform(-0.3, 0.3, samples).astype(np.float32)
                with wave.open(os.path.join(base, "audio", f"{utterance}.wav"), "wb") as file:
                    file.setnchannels(1)
                    file.setsampwidth(2)
                    file.setframerate(16_000)
                    file.writeframes((audio * 32767).astype("<i2").tobytes())
                total_seconds += SECONDS
    return total_seconds


def main() -> int:
    positional = [arg for arg in sys.argv[1:] if not arg.startswith("--")]
    utterances = int(positional[0]) if positional else 128
    beam = "--beam" in sys.argv  # predict -b 4 -n 2 (all heads beam-decoded)
    import jax

    from allophant_tpu.cli import run as run_cli
    from allophant_tpu.demo import build_flagship
    from allophant_tpu.training import Estimator

    work_dir = tempfile.mkdtemp(prefix="bench_predict_cli_")
    rng = np.random.default_rng(0)

    print("building + saving the flagship checkpoint...", file=sys.stderr, flush=True)
    from allophant_tpu.models.allophant import attribute_graph_from_config

    config, indexer, built = build_flagship()
    estimator = Estimator.from_config(
        config, 1, 16_000, attribute_graph_from_config(config, indexer), indexer,
        load_pretrained_weights=False,
    )
    checkpoint_path = os.path.join(work_dir, "flagship.ckpt")
    estimator.save(checkpoint_path, phonetic_indexer_state=indexer.state())
    del estimator, built

    # Two training languages as UCLA ISO-639-3 dirs, inventories from the demo
    # table (the composition path subsets the feature table per language).
    inventories = {
        "spa": list(indexer.phoneme_inventory("es")),
        "ita": list(indexer.phoneme_inventory("it")),
    }

    # One run with per-batch timing (ALLOPHANT_PREDICT_TIMING=1 makes the CLI
    # loop print "[predict-timing] batch <audio>s in <t>s" per batch). The
    # first batch per language shape carries the fused-program compile; the
    # steady-state RTF is computed over the warm batches.
    utterances = max((utterances // BATCH) * BATCH, 2 * BATCH)
    corpus = os.path.join(work_dir, "corpus")
    audio_seconds = write_ucla_corpus(corpus, inventories, utterances, rng)
    output = os.path.join(work_dir, "predictions.jsonl")

    import contextlib
    import io
    import re

    os.environ["ALLOPHANT_PREDICT_TIMING"] = "1"
    capture = io.StringIO()
    start = time.perf_counter()

    class _Tee(io.TextIOBase):
        def write(self, text):
            capture.write(text)
            return sys.__stderr__.write(text)

        def flush(self):
            sys.__stderr__.flush()

    profile = "--profile" in sys.argv  # cProfile the predict loop, top-40 cumulative
    profiler = None
    if profile:
        import cProfile

        profiler = cProfile.Profile()
    with contextlib.redirect_stderr(_Tee()):
        if profiler is not None:
            profiler.enable()
        run_cli.main(
            [
                "predict", corpus, checkpoint_path,
                "-t", "ucla-phonetic", "--no-progress",
                "-m", "utterances", "-s", str(BATCH),
                *((["-b", "4", "-n", "2"]) if beam else []),
                "-o", output,
            ]
        )
        if profiler is not None:
            profiler.disable()
    elapsed = time.perf_counter() - start
    if profiler is not None:
        import pstats

        stats = pstats.Stats(profiler, stream=sys.stderr)
        stats.sort_stats("cumulative").print_stats(40)
    del os.environ["ALLOPHANT_PREDICT_TIMING"]

    with open(output, "r", encoding="utf-8") as file:
        lines = sum(1 for _ in file)
    assert lines == 2 * utterances + 1, f"{lines} JSONL lines, expected {2 * utterances + 1}"

    batches = [
        (float(match.group(1)), float(match.group(2)))
        for match in re.finditer(
            r"\[predict-timing\] batch ([0-9.]+) audio-s in ([0-9.]+)s", capture.getvalue()
        )
    ]
    assert batches, "no [predict-timing] lines captured"
    # Drop the two slowest batches (the per-language fused-program compiles).
    warm = sorted(batches, key=lambda pair: pair[1] / max(pair[0], 1e-9))[: max(len(batches) - 2, 1)]
    warm_audio = sum(audio for audio, _ in warm)
    warm_time = sum(seconds for _, seconds in warm)
    steady_rtf = warm_audio / warm_time
    print(
        f"{len(batches)} batches; warm {len(warm)} batches: {warm_audio:.0f} audio-s"
        f" in {warm_time:.1f}s",
        file=sys.stderr, flush=True,
    )
    result = {
        "metric": "predict_cli_beam_rtf" if beam else "predict_cli_rtf",
        "value": round(steady_rtf, 2),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(steady_rtf / 50.0, 3),
        "end_to_end_rtf": round(audio_seconds / elapsed, 2),
        "batch": BATCH,
        "audio_seconds": audio_seconds,
        "batches": len(batches),
    }
    print(json.dumps(result))

    import shutil

    shutil.rmtree(work_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
