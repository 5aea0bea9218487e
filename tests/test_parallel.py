"""Multi-chip sharding tests on the virtual 8-device CPU mesh: full training step
under dp x tp shardings, and sharding-rule unit checks."""

import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec

from allophant_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, create_mesh
from allophant_tpu.parallel.sharding import param_spec, tree_param_shardings


class TestShardingRules:
    def test_column_parallel(self):
        assert param_spec(("encoder", "layers_0", "attention", "q_proj", "kernel")) == PartitionSpec(
            None, MODEL_AXIS
        )
        assert param_spec(("feed_forward", "intermediate_dense", "kernel")) == PartitionSpec(
            None, MODEL_AXIS
        )
        assert param_spec(("feed_forward", "intermediate_dense", "bias")) == PartitionSpec(MODEL_AXIS)

    def test_row_parallel(self):
        assert param_spec(("attention", "out_proj", "kernel")) == PartitionSpec(MODEL_AXIS, None)
        assert param_spec(("feed_forward", "output_dense", "kernel")) == PartitionSpec(MODEL_AXIS, None)
        # Row-parallel biases stay replicated (added after the reduce).
        assert param_spec(("attention", "out_proj", "bias")) == PartitionSpec()

    def test_replicated_default(self):
        assert param_spec(("projection", "classifiers_nasal", "kernel")) == PartitionSpec()
        assert param_spec(("feature_projection", "projection", "kernel")) == PartitionSpec()


class TestMesh:
    def test_create_mesh_shapes(self):
        mesh = create_mesh(jax.devices()[:8], model_parallel=2)
        assert mesh.shape[DATA_AXIS] == 4
        assert mesh.shape[MODEL_AXIS] == 2

    def test_mismatched_shape_raises(self):
        with pytest.raises(ValueError):
            create_mesh(jax.devices()[:8], data_parallel=3, model_parallel=2)


class TestProcessShardedBatching:
    """Host-level check of the multi-host data path: per-process slices must
    reassemble into exactly the single-process batch (same rows, same global pad
    targets), so `make_array_from_process_local_data` produces the same global
    array a single process would shard."""

    def _dataset(self, tmp_path):
        import wave

        from allophant_tpu.config import Config
        from allophant_tpu.data.dataset import BatchType, SamplesProcessor, PhoneticallySegmentedDataset
        from allophant_tpu.data.ucla import UCLAPhoneticCorpus
        from allophant_tpu.phonetics.features import PhoneticAttributeIndexer

        from fixtures import mini_allophoible_csv, mini_config_dict

        rng = np.random.default_rng(0)
        for language, phonemes in [("spa", ["a", "t", "n"]), ("ita", ["a", "s", "i"])]:
            base = tmp_path / language
            (base / "audio").mkdir(parents=True)
            with open(base / "inventory", "w", encoding="utf-8") as file:
                for phoneme in phonemes:
                    file.write(f"{phoneme} 5\n")
            with open(base / "raw", "w", encoding="utf-8") as raw, open(
                base / "text", "w", encoding="utf-8"
            ) as text:
                for index in range(3):
                    utterance = f"{language}_{index}"
                    raw.write(f"{utterance} rawform\n")
                    # Variable label counts so label pad targets matter.
                    text.write(f"{utterance} {' '.join(phonemes[: index + 1])}\n")
                    data = (rng.uniform(-0.3, 0.3, 1600 + 320 * index) * 32767).astype("<i2")
                    with wave.open(str(base / "audio" / f"{utterance}.wav"), "wb") as audio_file:
                        audio_file.setnchannels(1)
                        audio_file.setsampwidth(2)
                        audio_file.setframerate(16000)
                        audio_file.writeframes(data.tobytes())
        corpus = UCLAPhoneticCorpus.load(str(tmp_path), resample=16000)
        config = Config.load(mini_config_dict())
        indexer = PhoneticAttributeIndexer.from_config(config, mini_allophoible_csv())
        processor = SamplesProcessor.from_config(config, 16000, indexer)
        dataset = PhoneticallySegmentedDataset(BatchType.INDEXED, corpus, processor, 1)
        lengths = np.asarray(
            [dataset[index].length for index in range(len(corpus))], dtype=np.int64
        )
        return dataset, lengths

    def test_slices_reassemble_to_full_batch(self, tmp_path):
        from allophant_tpu.config import BatchingMode
        from allophant_tpu.data.batching import Batcher

        dataset, lengths = self._dataset(tmp_path)
        process_count = 2
        batcher_args = dict(
            batch_size=3, batching_mode=BatchingMode.UTTERANCES, data_workers=0,
            length_multiple=128, label_multiple=8,
        )
        full = list(Batcher(**batcher_args).batches(dataset, lengths, seed=1))
        slices = [
            list(
                Batcher(**batcher_args).batches(
                    dataset, lengths, seed=1,
                    process_shard=(process, process_count), shard_multiple=2,
                )
            )
            for process in range(process_count)
        ]

        assert len(full) == len(slices[0]) == len(slices[1])
        for batch_index, full_batch in enumerate(full):
            parts = [shard[batch_index] for shard in slices]
            # Same per-process shapes (required by the distributed assembly).
            assert parts[0].audio_features.shape == parts[1].audio_features.shape
            audio = np.concatenate([part.audio_features for part in parts])
            row_lengths = np.concatenate([part.lengths for part in parts])
            real = row_lengths > 0
            assert int(real.sum()) == len(full_batch)
            np.testing.assert_array_equal(row_lengths[real], full_batch.lengths)
            # Global time padding covers the full batch's padded width.
            assert audio.shape[1] >= full_batch.audio_features.shape[1]
            np.testing.assert_allclose(
                audio[real, : full_batch.audio_features.shape[1]], full_batch.audio_features
            )
            for name, labels in full_batch.attribute_indices.items():
                merged = np.concatenate([part.attribute_indices[name] for part in parts])
                merged_lengths = np.concatenate([part.label_lengths[name] for part in parts])
                np.testing.assert_array_equal(merged_lengths[real], full_batch.label_lengths[name])
                assert merged.shape[1] >= labels.shape[1]
                np.testing.assert_array_equal(merged[real, : labels.shape[1]], labels)

    def test_degenerate_tail_smaller_than_process_count(self, tmp_path):
        from allophant_tpu.config import BatchingMode
        from allophant_tpu.data.batching import Batcher

        dataset, lengths = self._dataset(tmp_path)
        # Batch size 4 over 6 samples -> tail batch of 2 rows for 4 processes.
        batcher_args = dict(
            batch_size=4, batching_mode=BatchingMode.UTTERANCES, data_workers=0,
            length_multiple=128, label_multiple=8,
        )
        process_count = 4
        slices = [
            list(
                Batcher(**batcher_args).batches(
                    dataset, lengths, seed=1, process_shard=(process, process_count)
                )
            )
            for process in range(process_count)
        ]
        tails = [shard[-1] for shard in slices]
        assert all(tail.audio_features.shape == tails[0].audio_features.shape for tail in tails)
        # 2 real rows live on the first two processes; the rest are zero-length filler.
        real_counts = [int((tail.lengths > 0).sum()) for tail in tails]
        assert sum(real_counts) == 2
        assert real_counts[2] == 0 and real_counts[3] == 0


class TestMultichipTrainStep:
    def test_dp_tp_train_step(self):
        """The __graft_entry__ dry run as a regression test: one full training step
        over a 4x2 (data x model) mesh with tiny shapes."""
        import __graft_entry__

        __graft_entry__.dryrun_multichip(8)

    def test_data_parallel_grad_equivalence(self):
        """A DP-sharded step must produce the same update as single-device: the batch
        is just laid out across devices; psums make gradients identical."""
        import jax.numpy as jnp
        import optax

        mesh = create_mesh(jax.devices()[:4], model_parallel=1)

        def loss_fn(params, batch):
            predictions = batch["x"] @ params["w"]
            return ((predictions - batch["y"]) ** 2).mean()

        rng = np.random.default_rng(0)
        params = {"w": jnp.asarray(rng.standard_normal((8, 4)).astype(np.float32))}
        batch = {
            "x": jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32)),
            "y": jnp.asarray(rng.standard_normal((16, 4)).astype(np.float32)),
        }
        single_grads = jax.grad(loss_fn)(params, batch)

        batch_sharding = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
        replicated = NamedSharding(mesh, PartitionSpec())
        sharded_batch = jax.tree_util.tree_map(
            lambda array: jax.device_put(array, batch_sharding), batch
        )
        sharded_params = jax.tree_util.tree_map(
            lambda array: jax.device_put(array, replicated), params
        )
        sharded_grads = jax.jit(jax.grad(loss_fn))(sharded_params, sharded_batch)
        np.testing.assert_allclose(
            np.asarray(single_grads["w"]), np.asarray(sharded_grads["w"]), rtol=2e-5
        )


class TestDataParallelInference:
    def test_predict_sharded_matches_single_device(self):
        """Estimator.predict over an 8-device data mesh must match unsharded."""
        import numpy as np
        from allophant_tpu.config import Config
        from allophant_tpu.data.batch import Batch
        from allophant_tpu.models.allophant import attribute_graph_from_config
        from allophant_tpu.phonetics.features import PhoneticAttributeIndexer
        from allophant_tpu.training.estimator import Estimator
        from fixtures import mini_allophoible_csv, mini_config_dict

        config = Config.load(mini_config_dict())
        indexer = PhoneticAttributeIndexer.from_config(config, mini_allophoible_csv())
        estimator = Estimator.from_config(
            config, 1, 16_000, attribute_graph_from_config(config, indexer), indexer,
            load_pretrained_weights=False,
        )

        rng = np.random.default_rng(0)
        audio = rng.standard_normal((8, 1600)).astype(np.float32)
        batch = Batch(audio, np.full(8, 1600, dtype=np.int32), 0)

        single = estimator.predict(batch)
        heads = tuple(sorted(single.outputs))
        single_grid, _lengths = estimator.predict_decoded(batch, heads=heads)
        estimator.use_data_parallel(create_mesh(jax.devices()[:8], model_parallel=1))
        sharded = estimator.predict(batch)
        sharded_grid, _lengths = estimator.predict_decoded(batch, heads=heads)

        for name in single.outputs:
            np.testing.assert_allclose(
                np.asarray(single.outputs[name]), np.asarray(sharded.outputs[name]),
                atol=1e-5, rtol=1e-5,
            )
        # The fused serving grid (forward + greedy decode + packed drain in one
        # program) must shard identically too.
        np.testing.assert_array_equal(np.asarray(single_grid), np.asarray(sharded_grid))


class TestBatchSharding:
    def test_shard_batch_pytree_matches_device_put(self):
        from allophant_tpu.parallel.mesh import batch_sharding, create_mesh, shard_batch_pytree

        mesh = create_mesh(jax.devices()[:8], model_parallel=1)
        tree = {
            "audio": np.random.default_rng(0).standard_normal((8, 100)).astype(np.float32),
            "lengths": np.full(8, 100, dtype=np.int32),
        }
        sharded = shard_batch_pytree(tree, mesh)
        for name, original in tree.items():
            placed = sharded[name]
            assert placed.sharding == batch_sharding(mesh)
            np.testing.assert_array_equal(np.asarray(placed), original)

    def test_process_local_slice_single_process(self):
        from allophant_tpu.parallel.mesh import process_local_slice

        # With one process every size divides and the slice covers everything.
        assert process_local_slice(16) == slice(0, 16)
        assert process_local_slice(7) == slice(0, 7)
