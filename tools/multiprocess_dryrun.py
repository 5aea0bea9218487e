"""Multi-process (multi-host) training dry run on virtual CPU devices.

Validates the pod story end to end without pod hardware: N processes x M virtual
CPU devices each, `jax.distributed` + gloo collectives, process-sharded data
loading (each process materializes only its row slice,
``Batcher._generate_process_slices``) assembled with
``jax.make_array_from_process_local_data``, and the jit'd SPMD train step over
the global (data, model) mesh. The parent also runs the identical setup
single-process and asserts loss/grad-norm equality (the multi-host path must be
semantically invisible).

Beyond the train step, each process also runs the inference path (a forward
``Estimator.predict`` over one deterministic batch) and the comparison includes
its per-head log-prob checksum, so sharded predict/eval wiring is gated too.

Usage:
    python tools/multiprocess_dryrun.py [nprocs] [ndev]   # parent: spawn + compare
    python tools/multiprocess_dryrun.py worker <pid> <nprocs> <ndev> <port> <dir> <out>

The full gate is 2x4 (the pod shape the round-2 validation used); the test suite
runs the reduced 2x2 variant (tests/test_multiprocess_dryrun.py) so multi-host
wiring cannot rot unnoticed.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import wave

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

NUM_PROCESSES = 2
DEVICES_PER_PROCESS = 4


def build_corpus(root: str) -> None:
    """Tiny deterministic UCLA-format corpus: 2 languages x 4 utterances."""
    rng = np.random.default_rng(3)
    for language, phonemes in [("spa", ["a", "t", "n"]), ("ita", ["a", "s", "i"])]:
        base = os.path.join(root, language)
        os.makedirs(os.path.join(base, "audio"), exist_ok=True)
        with open(os.path.join(base, "inventory"), "w", encoding="utf-8") as file:
            for phoneme in phonemes:
                file.write(f"{phoneme} 5\n")
        with open(os.path.join(base, "raw"), "w", encoding="utf-8") as raw, open(
            os.path.join(base, "text"), "w", encoding="utf-8"
        ) as text:
            for index in range(4):
                utterance = f"{language}_{index}"
                raw.write(f"{utterance} rawform\n")
                text.write(f"{utterance} {' '.join(phonemes)}\n")
                samples = (np.clip(rng.uniform(-0.3, 0.3, 1600 + 160 * index), -1, 1) * 32767).astype("<i2")
                with wave.open(os.path.join(base, "audio", f"{utterance}.wav"), "wb") as audio:
                    audio.setnchannels(1)
                    audio.setsampwidth(2)
                    audio.setframerate(16000)
                    audio.writeframes(samples.tobytes())


def run_training(corpus_dir: str) -> dict:
    """One epoch of the tiny training setup; returns first-epoch metrics."""
    from allophant_tpu.config import Config
    from allophant_tpu.data.speech_corpus import MultilingualSplits
    from allophant_tpu.data.ucla import UCLAPhoneticCorpus
    from allophant_tpu.phonetics.features import PhoneticAttributeIndexer
    from allophant_tpu.training.estimator import Estimator
    from allophant_tpu.training.run import DatasetManager

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from fixtures import mini_allophoible_csv, mini_config_dict

    config_dict = mini_config_dict()
    config_dict["nn"]["batch_size"] = 4
    config_dict["nn"]["maximum_iterations"] = 1
    config_dict["nn"]["accumulation_factor"] = 2
    config = Config.load(config_dict)

    corpus = UCLAPhoneticCorpus.load(corpus_dir, resample=16000)
    indexer = PhoneticAttributeIndexer.from_config(config, mini_allophoible_csv())
    splits = MultilingualSplits.single(corpus, "train")
    splits.dev = corpus
    manager = DatasetManager.from_config(
        config, splits, indexer, length_multiple=128, label_multiple=8
    )
    estimator = Estimator.from_config(
        config,
        manager.feature_size,
        16_000,
        manager.attribute_graph(),
        indexer,
        load_pretrained_weights=False,
    )
    results = list(estimator.train(manager))
    first = results[0][1]

    # Inference-path coverage: a deterministic predict over one small batch; the
    # per-head log-prob checksum must agree across workers and the baseline.
    import numpy as np

    from allophant_tpu.data.batch import Batch

    rng = np.random.default_rng(11)
    audio = rng.standard_normal((2, 1600)).astype(np.float32)
    predictions = estimator.predict(
        Batch(audio, np.array([1600, 1280], dtype=np.int32), np.array([0, 1], dtype=np.int32))
    )
    checksum = float(
        sum(np.asarray(value, np.float64).sum() for value in predictions.outputs.values())
    )
    return {
        "train_loss": first.train_loss,
        "validation_loss": first.validation_loss,
        "gradient_norm": first.gradient_norm,
        "predict_checksum": checksum,
        "global_step": first.global_step,
    }


def worker(process_id: int, num_processes: int, num_devices: int, port: int, corpus_dir: str, out_path: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", num_devices)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=num_processes, process_id=process_id
    )
    assert jax.process_count() == num_processes
    assert jax.device_count() == num_processes * num_devices

    metrics = run_training(corpus_dir)
    with open(out_path, "w", encoding="utf-8") as file:
        json.dump(metrics, file)


def parent(num_processes: int = NUM_PROCESSES, devices_per_process: int = DEVICES_PER_PROCESS) -> int:
    script = os.path.abspath(__file__)
    repo = os.path.dirname(os.path.dirname(script))
    with tempfile.TemporaryDirectory() as scratch:
        corpus_dir = os.path.join(scratch, "corpus")
        os.makedirs(corpus_dir)
        build_corpus(corpus_dir)

        port = 12000 + (os.getpid() % 20000)
        environment = {
            **os.environ,
            "PYTHONPATH": repo + os.pathsep + os.environ.get("PYTHONPATH", ""),
            "JAX_PLATFORMS": "cpu",
        }
        outputs = [os.path.join(scratch, f"metrics_{pid}.json") for pid in range(num_processes)]
        processes = [
            subprocess.Popen(
                [
                    sys.executable, script, "worker", str(pid), str(num_processes),
                    str(devices_per_process), str(port), corpus_dir, outputs[pid],
                ],
                env=environment,
            )
            for pid in range(num_processes)
        ]
        codes = [process.wait(timeout=1800) for process in processes]
        if any(codes):
            print(f"dryrun_multiprocess FAILED: worker exit codes {codes}")
            return 1
        results = []
        for path in outputs:
            with open(path, "r", encoding="utf-8") as file:
                results.append(json.load(file))

        # Single-process baseline in this process (same global device count, same math).
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", num_processes * devices_per_process)
        baseline = run_training(corpus_dir)

        ok = True
        for key in ("train_loss", "validation_loss", "gradient_norm", "predict_checksum"):
            values = [result[key] for result in results] + [baseline[key]]
            if not np.allclose(values, values[0], rtol=2e-4, atol=1e-5):
                print(f"MISMATCH {key}: workers={values[:-1]} baseline={values[-1]}")
                ok = False
        if ok:
            print(
                "dryrun_multiprocess OK: "
                f"{num_processes} processes x {devices_per_process} devices, "
                f"loss={baseline['train_loss']:.6f} grad_norm={baseline['gradient_norm']:.6f} "
                f"predict_checksum={baseline['predict_checksum']:.6f} "
                f"(workers match single-process run)"
            )
        return 0 if ok else 1


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(
            int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5]),
            sys.argv[6], sys.argv[7],
        )
        return 0
    num_processes = int(sys.argv[1]) if len(sys.argv) > 1 else NUM_PROCESSES
    devices_per_process = int(sys.argv[2]) if len(sys.argv) > 2 else DEVICES_PER_PROCESS
    return parent(num_processes, devices_per_process)


if __name__ == "__main__":
    sys.exit(main())
