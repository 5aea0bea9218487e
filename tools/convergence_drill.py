"""End-to-end proof that the production CLI training loop *learns* (VERDICT r4 #1).

The reference's core deliverable is "training produces a working model"
(reference estimator.py:800-928, run.py:145-273; SURVEY.md §3.1). The loop's
semantics are oracle-tested and the in-process train step demonstrably learns,
but this drill exercises the one composition nothing else does: the real
`allophant train` CLI — DatasetManager, samplers, validation cadence,
checkpoint cadence, preemption/resume — composed with `predict`, `evaluate`,
and `allophant-error-rates`, asserting that held-out PER collapses far below
chance and that a SIGTERM-interrupted + resumed run matches an uninterrupted
control.

Corpus: synthetic "tone language" Common Voice data (tests/fixtures.py
build_tone_corpus) — each phoneme is a pure tone at a distinct mel-spaced
frequency, so the tone->phoneme mapping is learnable by the mini transformer
in a few hundred CTC steps. Chance PER is ~100% (11-12 phonemes/language).

Phases:
  1. control:      train --save-all for N epochs (subprocess, CPU)
  2. interrupted:  same seed; SIGTERM once >=2 epoch checkpoints exist;
                   resume with --restore (prefers interrupted.ckpt); finish
  3. trajectory:   predict + evaluate at epoch checkpoints -> PER curve
  4. report:       allophant-error-rates over the final evaluation JSON
  5. asserts:      final PER < 0.15; epoch-1 PER > 2x final; |control - resumed|
                   final PER < 0.05

Usage: JAX_PLATFORMS=cpu python tools/convergence_drill.py [--epochs 40]
(ALLOPHANT_DRILL_TPU=1 runs the whole drill on the real chip instead —
the production train CLI training on TPU hardware end to end)
(~15 min on CPU; the XLA compile cache makes the second training run much
cheaper). Recorded results live in ARCHITECTURE.md ("Convergence drill"
section).
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from fixtures import build_tone_corpus, mini_allophoible_csv, tone_corpus_config


def run_training(
    corpus_root: str,
    attribute_path: str,
    save_dir: str,
    config: dict,
    interrupt_after_epochs: int | None = None,
    timeout: float = 1800.0,
) -> str:
    """Runs `allophant train` as a subprocess; optionally SIGTERMs it once
    `interrupt_after_epochs` epoch checkpoints exist, then resumes with
    --restore to completion. Returns the combined stdout."""
    # Prepend rather than replace PYTHONPATH: the axon TPU plugin lives on the
    # inherited path (/root/.axon_site) and vanishes if overwritten.
    env = {**os.environ}
    env["PYTHONPATH"] = "/root/repo" + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    args = [
        sys.executable, "-m", "allophant_tpu.cli.run", "train", corpus_root,
        "--no-progress", "-j", json.dumps(config),
        "-a", attribute_path, "-s", save_dir, "--save-all",
    ]
    if os.environ.get("ALLOPHANT_DRILL_TPU") != "1":
        env["JAX_PLATFORMS"] = "cpu"
        args.insert(4, "--cpu")
    os.makedirs(save_dir, exist_ok=True)
    output = []

    if interrupt_after_epochs is not None:
        process = subprocess.Popen(
            args, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True
        )
        deadline = time.time() + timeout
        while time.time() < deadline:
            checkpoints = [
                name for name in os.listdir(save_dir) if name.startswith("epoch-")
            ]
            if len(checkpoints) >= interrupt_after_epochs:
                break
            if process.poll() is not None:
                break
            time.sleep(1.0)
        else:
            process.kill()
            raise TimeoutError("training never reached the interrupt point")
        if process.poll() is not None:
            process.communicate(timeout=timeout)
            raise RuntimeError(
                f"training finished (rc {process.returncode}) before reaching"
                f" {interrupt_after_epochs} epoch checkpoints — nothing to interrupt;"
                " lower --interrupt-after relative to --epochs"
            )
        process.send_signal(signal.SIGTERM)
        out, _ = process.communicate(timeout=timeout)
        output.append(out)
        assert process.returncode == 0, f"interrupted train exited {process.returncode}:\n{out[-2000:]}"
        interrupted = os.path.join(save_dir, "interrupted.ckpt")
        assert os.path.isfile(interrupted), "no interrupted checkpoint after SIGTERM"
        print(f"  interrupted after {len(checkpoints)} epochs; resuming with --restore")
        args = args + ["--restore"]

    completed = subprocess.run(
        args, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=timeout,
    )
    output.append(completed.stdout)
    assert completed.returncode == 0, f"train exited {completed.returncode}:\n{completed.stdout[-2000:]}"
    return "\n".join(output)


def evaluate_checkpoint(checkpoint_path: str, corpus_root: str, work_dir: str, tag: str) -> dict:
    """predict -> evaluate through the real CLI; returns macro error rates."""
    from allophant_tpu.cli import run as run_cli
    from allophant_tpu.evaluation import MultilingualEvaluationResults, macro_average_error_rates

    predictions_path = os.path.join(work_dir, f"predictions_{tag}.jsonl")
    results_path = os.path.join(work_dir, f"results_{tag}.json")
    predict_args = [] if os.environ.get("ALLOPHANT_DRILL_TPU") == "1" else ["--cpu"]
    run_cli.main(
        [
            "predict", corpus_root, checkpoint_path,
            "-t", "common-voice", "--no-progress", *predict_args,
            "--precision", "float32",
            "-m", "utterances", "-s", "16",
            "-o", predictions_path,
        ]
    )
    run_cli.main(["evaluate", predictions_path, "-j", "-o", results_path, "--no-progress"])
    results = MultilingualEvaluationResults.load(results_path)
    return macro_average_error_rates(results), results_path


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--epochs", type=int, default=40)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--interrupt-after", type=int, default=10, help="epochs before SIGTERM")
    parser.add_argument("--keep", action="store_true", help="keep the work directory")
    arguments = parser.parse_args(argv)

    if os.environ.get("ALLOPHANT_DRILL_TPU") != "1":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    work_dir = tempfile.mkdtemp(prefix="convergence_drill_")
    print(f"work dir: {work_dir}")
    corpus_root = os.path.join(work_dir, "cv")
    os.makedirs(corpus_root)
    build_tone_corpus(
        corpus_root, utterances_per_split=((("train", 256), ("dev", 16), ("test", 32)))
    )
    attribute_path = os.path.join(work_dir, "features.csv")
    with open(attribute_path, "w", encoding="utf-8") as file:
        file.write(mini_allophoible_csv())
    config = tone_corpus_config(arguments.epochs, arguments.batch_size)

    start = time.time()
    print(f"[1/4] control run: {arguments.epochs} epochs, batch {arguments.batch_size}")
    control_dir = os.path.join(work_dir, "control")
    run_training(corpus_root, attribute_path, control_dir, config)
    print(f"  control done in {time.time() - start:.0f}s")

    print(f"[2/4] interrupted run: SIGTERM after {arguments.interrupt_after} epochs, then --restore")
    interrupted_dir = os.path.join(work_dir, "interrupted")
    run_training(
        corpus_root, attribute_path, interrupted_dir, config,
        interrupt_after_epochs=arguments.interrupt_after,
    )

    print("[3/4] PER trajectory through predict -> evaluate (held-out test split)")
    sample_epochs = sorted({1, max(arguments.epochs // 4, 1), max(arguments.epochs // 2, 1), arguments.epochs})
    trajectory = {}
    results_path = None
    for epoch in sample_epochs:
        checkpoint = os.path.join(control_dir, f"epoch-{epoch}.ckpt")
        if not os.path.isfile(checkpoint):
            continue
        rates, results_path = evaluate_checkpoint(checkpoint, corpus_root, work_dir, f"epoch{epoch}")
        trajectory[epoch] = rates["phoneme_error_rate"]
        print(f"  epoch {epoch:3d}: test PER {100 * trajectory[epoch]:6.2f}%")

    resumed_rates, _ = evaluate_checkpoint(
        os.path.join(interrupted_dir, f"epoch-{arguments.epochs}.ckpt"),
        corpus_root, work_dir, "resumed",
    )
    resumed_per = resumed_rates["phoneme_error_rate"]
    print(f"  resumed final: test PER {100 * resumed_per:6.2f}%")

    print("[4/4] allophant-error-rates report over the final control evaluation")
    from allophant_tpu.cli import error_rates as error_rates_cli

    error_rates_cli.main([results_path])

    first_epoch = min(trajectory)
    final_epoch = max(trajectory)
    first_per, final_per = trajectory[first_epoch], trajectory[final_epoch]
    print(
        f"\nsummary: PER epoch {first_epoch} {100 * first_per:.2f}% -> epoch {final_epoch}"
        f" {100 * final_per:.2f}% (control), {100 * resumed_per:.2f}% (interrupted+resumed);"
        f" chance ~100% ({time.time() - start:.0f}s total)"
    )
    assert final_per < 0.15, f"control run failed to learn: final PER {final_per:.3f}"
    assert resumed_per < 0.15, f"resumed run failed to learn: final PER {resumed_per:.3f}"
    assert first_per > 2 * final_per, (
        f"no collapse: epoch-{first_epoch} PER {first_per:.3f} vs final {final_per:.3f}"
    )
    assert abs(final_per - resumed_per) < 0.05, (
        f"resumed run diverged from control: {resumed_per:.3f} vs {final_per:.3f}"
    )
    if not arguments.keep:
        import shutil

        shutil.rmtree(work_dir, ignore_errors=True)
    print("convergence drill OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
