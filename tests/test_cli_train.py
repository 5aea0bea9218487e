"""End-to-end train CLI test on a tiny synthetic Common Voice corpus."""

import json
import os
import numpy as np

from allophant_tpu.cli import run as run_cli
from allophant_tpu.training import checkpoint as checkpoint_module

from fixtures import build_cv_corpus, mini_allophoible_csv, mini_config_dict


def test_train_cli_end_to_end(tmp_path):
    corpus_root = str(tmp_path / "cv")
    os.makedirs(corpus_root)
    build_cv_corpus(corpus_root)

    attribute_path = str(tmp_path / "features.csv")
    with open(attribute_path, "w", encoding="utf-8") as file:
        file.write(mini_allophoible_csv())

    config = mini_config_dict()
    config["nn"]["batch_size"] = 2
    config["nn"]["maximum_iterations"] = 1
    config["data"]["languages"] = ["es", "it"]

    save_path = str(tmp_path / "model.ckpt")
    run_cli.main(
        [
            "train",
            corpus_root,
            "--cpu",
            "--no-progress",
            "-j",
            json.dumps(config),
            "-a",
            attribute_path,
            "-s",
            save_path,
        ]
    )
    assert os.path.isfile(save_path)

    checkpoint = checkpoint_module.load_checkpoint(save_path)
    assert checkpoint.variables is not None
    assert checkpoint.phonetic_indexer_state is not None
    # The optimizer/early-stopping bundle is persisted for resume.
    assert checkpoint.optimizer_state is not None
    # Restorable end to end.
    from allophant_tpu.training import Estimator

    estimator, indexer = Estimator.restore(checkpoint, precision="float32")
    assert "phoneme" in estimator.classes
    assert estimator.training_state is not None

    # Resume through the CLI: --restore picks up the checkpoint (with its
    # optimizer state and recorded epoch position) and trains one more epoch.
    config["nn"]["maximum_iterations"] = 2
    run_cli.main(
        [
            "train",
            corpus_root,
            "--cpu",
            "--no-progress",
            "-j",
            json.dumps(config),
            "-a",
            attribute_path,
            "-s",
            save_path,
            "--restore",
        ]
    )
    resumed = checkpoint_module.load_checkpoint(save_path)
    assert resumed.epoch.epoch >= checkpoint.epoch.epoch


def test_train_cli_with_precomputed_features(tmp_path):
    """Train from the ragged feature store (-f), exercising the preprocess ->
    train pipeline end to end."""
    corpus_root = str(tmp_path / "cv")
    os.makedirs(corpus_root)
    build_cv_corpus(corpus_root)

    attribute_path = str(tmp_path / "features.csv")
    with open(attribute_path, "w", encoding="utf-8") as file:
        file.write(mini_allophoible_csv())

    config = mini_config_dict()
    config["nn"]["batch_size"] = 2
    config["nn"]["maximum_iterations"] = 1
    config["data"]["languages"] = ["es", "it"]

    from allophant_tpu.cli import data as data_cli

    features_dir = str(tmp_path / "features_store")
    data_cli.main(["preprocess", corpus_root, features_dir, "-j", json.dumps(config)])

    save_path = str(tmp_path / "model.ckpt")
    run_cli.main(
        [
            "train", corpus_root, "--cpu", "--no-progress",
            "-j", json.dumps(config),
            "-a", attribute_path,
            "-f", features_dir,
            "-s", save_path,
        ]
    )
    assert os.path.isfile(save_path)


def test_train_cli_with_zarr_cache(tmp_path):
    """`allophant-data preprocess --zarr` writes the reference's zarr-v2 cache
    layout; `allophant train -f` auto-detects and reads it through the interop
    layer (data/zarr_store.py) — a reference user's precomputed cache feeds the
    production training loop unchanged (reference corpus_loading.py:143-162)."""
    corpus_root = str(tmp_path / "cv")
    os.makedirs(corpus_root)
    build_cv_corpus(corpus_root)

    attribute_path = str(tmp_path / "features.csv")
    with open(attribute_path, "w", encoding="utf-8") as file:
        file.write(mini_allophoible_csv())

    config = mini_config_dict()
    config["nn"]["batch_size"] = 2
    config["nn"]["maximum_iterations"] = 1
    config["data"]["languages"] = ["es", "it"]

    from allophant_tpu.cli import data as data_cli

    features_dir = str(tmp_path / "zarr_store")
    data_cli.main(["preprocess", corpus_root, features_dir, "--zarr", "-j", json.dumps(config)])
    assert os.path.isfile(os.path.join(features_dir, ".zgroup"))
    assert os.path.isfile(os.path.join(features_dir, "train", "es", "features", ".zarray"))

    # Cached features must equal the inline feature function's output on the
    # real audio (this differential caught the preprocess CLI passing a
    # pre-extracted channel into FeatureFunction, which stored one scalar per
    # utterance).
    from allophant_tpu.config import Config
    from allophant_tpu.data import corpus_loading
    from allophant_tpu.data.preprocessing import FeatureFunction

    loaded_config = Config.load(config)
    corpus = corpus_loading.load_corpus(
        corpus_root, "common-voice", 16000, ["es", "it"], None, False, False
    )
    feature_function = FeatureFunction.from_config(loaded_config, 16000)
    cached = corpus_loading.preprocessed_features_or_lengths(
        features_dir, {"train": corpus.train.languages}, lengths_only=False
    )["train"]
    index = 0
    for language in corpus.train.languages:
        for utterance in corpus.train.monolingual_index_range(language):
            audio, _rate = corpus.train.audio(utterance)
            expected = feature_function(audio)
            if expected.ndim == 1:
                expected = expected[:, None]
            np.testing.assert_allclose(cached.features[index], expected, rtol=1e-6)
            index += 1

    save_path = str(tmp_path / "model.ckpt")
    run_cli.main(
        [
            "train", corpus_root, "--cpu", "--no-progress",
            "-j", json.dumps(config),
            "-a", attribute_path,
            "-f", features_dir,
            "-s", save_path,
        ]
    )
    assert os.path.isfile(save_path)


def test_step_profiler_writes_trace(tmp_path):
    """StepProfiler drives jax.profiler trace windows from ProfilingConfig."""
    from allophant_tpu.config import ProfilingConfig
    from allophant_tpu.training.run import StepProfiler

    trace_dir = str(tmp_path / "traces")
    profiler = StepProfiler(ProfilingConfig(active_steps=2, tensorboard_dir=trace_dir))
    import jax
    import jax.numpy as jnp

    for step in range(1, 8):
        jnp.ones(8).sum().block_until_ready()
        profiler.step(step)
    profiler.stop()
    contents = []
    for root, _dirs, files in os.walk(trace_dir):
        contents.extend(files)
    assert contents  # trace events written


def test_step_profiler_writes_cpu_flame_graph(tmp_path):
    """flame_graph_path_cpu produces collapsed stacks (reference export_stacks
    analogue); flame_graph_path_gpu captures a device trace without
    tensorboard_dir."""
    import time

    from allophant_tpu.config import ProfilingConfig
    from allophant_tpu.training.run import StepProfiler

    cpu_path = str(tmp_path / "cpu_stacks.txt")
    gpu_path = str(tmp_path / "device")
    profiler = StepProfiler(
        ProfilingConfig(
            active_steps=2, flame_graph_path_cpu=cpu_path, flame_graph_path_gpu=gpu_path
        )
    )
    import jax.numpy as jnp

    for step in range(1, 8):
        jnp.ones(64).sum().block_until_ready()
        time.sleep(0.03)  # give the 5 ms sampler frames to capture
        profiler.step(step)
    profiler.stop()

    with open(cpu_path, "r", encoding="utf-8") as file:
        lines = file.read().strip().splitlines()
    assert lines, "no stacks sampled"
    stack, count = lines[0].rsplit(" ", 1)
    assert ";" in stack or "(" in stack
    assert int(count) >= 1
    trace_files = []
    for root, _dirs, files in os.walk(gpu_path + ".trace"):
        trace_files.extend(files)
    assert trace_files  # device trace captured


def test_train_cli_data_parallel_over_virtual_mesh(tmp_path):
    """With batch_size divisible by the (virtual 8-device) mesh, the training
    loop shards microbatches over the data axis and still produces a loadable
    checkpoint."""
    corpus_root = str(tmp_path / "cv")
    os.makedirs(corpus_root)
    build_cv_corpus(corpus_root, utterances_per_split=((("train", 8), ("dev", 2), ("test", 1))))

    attribute_path = str(tmp_path / "features.csv")
    with open(attribute_path, "w", encoding="utf-8") as file:
        file.write(mini_allophoible_csv())

    config = mini_config_dict()
    config["nn"]["batch_size"] = 8
    config["nn"]["maximum_iterations"] = 1
    config["data"]["languages"] = ["es", "it"]

    save_path = str(tmp_path / "model.ckpt")
    run_cli.main(
        [
            "train", corpus_root, "--cpu", "--no-progress",
            "-j", json.dumps(config), "-a", attribute_path, "-s", save_path,
        ]
    )
    checkpoint = checkpoint_module.load_checkpoint(save_path)
    assert checkpoint.variables is not None


def test_train_cli_frames_mode_with_indivisible_batches(tmp_path):
    """Frame-budget batching yields variable row counts; on a multi-device mesh
    steps whose batch axis does not divide the devices run replicated instead
    of erroring (training/run.py per-step guard)."""
    corpus_root = str(tmp_path / "cv")
    os.makedirs(corpus_root)
    build_cv_corpus(corpus_root, utterances_per_split=((("train", 5), ("dev", 2), ("test", 1))))

    attribute_path = str(tmp_path / "features.csv")
    with open(attribute_path, "w", encoding="utf-8") as file:
        file.write(mini_allophoible_csv())

    config = mini_config_dict()
    # A frame budget that packs 1-3 utterances per batch (clips are ~1600-2400
    # samples): batch rows will not divide the 8-device virtual mesh.
    config["nn"]["batch_size"] = 6000
    config["nn"]["batching_mode"] = "frames"
    config["nn"]["maximum_iterations"] = 1
    config["data"]["languages"] = ["es", "it"]

    save_path = str(tmp_path / "model.ckpt")
    run_cli.main(
        [
            "train", corpus_root, "--cpu", "--no-progress",
            "-j", json.dumps(config), "-a", attribute_path, "-s", save_path,
        ]
    )
    checkpoint = checkpoint_module.load_checkpoint(save_path)
    assert checkpoint.variables is not None
