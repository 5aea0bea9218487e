"""End-to-end Estimator tests: restore from a synthesized reference-format (torch)
checkpoint, numerical parity of the full pipeline against a torch reimplementation of
the head math, native save/restore round trip, and the greedy decode flow."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from allophant_tpu.config import Config
from allophant_tpu.data.batch import Batch
from allophant_tpu.models.wav2vec2 import Wav2Vec2Architecture
from allophant_tpu.phonetics.features import LanguageInventories, PhoneticAttributeIndexer
from allophant_tpu.predictions import feature_decoders
from allophant_tpu.training.estimator import Estimator

from fixtures import CLASSIFIER_FEATURES, mini_allophoible_csv, mini_config_dict

TINY = dict(
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=48,
    conv_dim=(12, 16),
    conv_kernel=(4, 3),
    conv_stride=(2, 2),
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
)

TINY_ARCH = Wav2Vec2Architecture(
    **TINY, hidden_dropout=0.0, activation_dropout=0.0, attention_dropout=0.0
)


def _torch_projecting_attention(input_dimensions, hidden_dimensions, num_heads):
    """Torch twin of the reference's ProjectingMultiheadAttention
    (acoustic_model.py:237-268): Linear -> LayerNorm -> nn.MultiheadAttention."""
    import torch

    class TorchPMA(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.input_projection = torch.nn.Linear(input_dimensions, hidden_dimensions)
            self.layer_norm = torch.nn.LayerNorm(hidden_dimensions)
            self.attention = torch.nn.MultiheadAttention(hidden_dimensions, num_heads)

        def forward(self, inputs, key_padding_mask=None):  # inputs [T, B, E]
            hidden = self.layer_norm(self.input_projection(inputs))
            return self.attention(
                hidden, hidden, hidden, key_padding_mask, need_weights=False
            )[0]

    return TorchPMA().eval()


def _make_reference_checkpoint(
    tmp_path,
    phoneme_layer="shared",
    composition=False,
    attention_heads=None,
    phoneme_dependencies=None,
):
    """Synthesizes a checkpoint in the reference's on-disk format: torch.save of the
    marshmallow-dump structure with reference state-dict names, driving the real HF
    torch wav2vec2 plus torch classifier heads.

    ``attention_heads``: {node name -> num_heads} gives those classifiers a
    ProjectingMultiheadAttention time layer; ``phoneme_dependencies`` overrides the
    phoneme node's dependency list (hierarchical head)."""
    import torch
    from transformers import Wav2Vec2Config as HFConfig
    from transformers.models.wav2vec2.modeling_wav2vec2 import Wav2Vec2Model as TorchWav2Vec2

    config_dict = mini_config_dict(
        phoneme_layer=phoneme_layer, embedding_composition=composition, model_type="wav2vec2"
    )
    attention_heads = attention_heads or {}
    for entry in config_dict["nn"]["projection"]["classes"]:
        if entry["name"] in attention_heads:
            entry["time_layer"] = {
                "type": "multi-head-attention",
                "num_heads": attention_heads[entry["name"]],
            }
        if entry["name"] == "phoneme" and phoneme_dependencies is not None:
            entry["dependencies"] = list(phoneme_dependencies)
    config = Config.load(config_dict)
    inventories = LanguageInventories({0: ["a", "b", "d", "t"], 1: ["a", "t", "s"]}, ["es", "it"])
    indexer = PhoneticAttributeIndexer.from_config(config, mini_allophoible_csv(), inventories)

    hf_config = HFConfig(
        **TINY,
        conv_bias=True,
        do_stable_layer_norm=True,
        feat_extract_norm="layer",
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    torch_encoder = TorchWav2Vec2(hf_config).eval()

    model_state = {
        f"_acoustic_model._model.{key}": value for key, value in torch_encoder.state_dict().items()
    }

    # Classifier heads: torch Linear (or ProjectingMultiheadAttention) per
    # attribute (+ phoneme), reference naming.
    torch_heads = {}
    hidden = TINY["hidden_size"]
    for name in CLASSIFIER_FEATURES:
        size = indexer.size(name) + 1
        base = f"_projection._layers.{name}._time_distributed_layer"
        if name in attention_heads:
            layer = _torch_projecting_attention(hidden, size, attention_heads[name])
            for key, value in layer.state_dict().items():
                model_state[f"{base}.{key}"] = value
        else:
            layer = torch.nn.Linear(hidden, size)
            model_state[f"{base}.weight"] = layer.weight.data
            model_state[f"{base}.bias"] = layer.bias.data
        torch_heads[name] = layer

    if composition:
        embedding_size = config.nn.projection.embedding_composition.embedding_size
        phoneme_out = embedding_size
    elif phoneme_layer == "allophones":
        phoneme_out = len(indexer.language_allophones.shared_phones) + 1
    else:
        phoneme_out = len(indexer.phonemes) + 1
    phoneme_in = hidden
    if phoneme_dependencies is not None:
        # Hierarchical head: concat of OUTPUT plus softmaxed dependency logits.
        phoneme_in = sum(
            hidden if dep.startswith("OUTPUT") else indexer.size(dep) + 1
            for dep in phoneme_dependencies
        )
    phoneme_head = torch.nn.Linear(phoneme_in, phoneme_out)
    torch_heads["phoneme"] = phoneme_head
    model_state["_projection._layers.phoneme._time_distributed_layer.weight"] = phoneme_head.weight.data
    model_state["_projection._layers.phoneme._time_distributed_layer.bias"] = phoneme_head.bias.data

    allophone_matrices = None
    if phoneme_layer == "allophones":
        # Reference init (blank diag + allophone pattern ones) plus noise at the
        # pattern positions, so restore parity is observable.
        from allophant_tpu.models.projection import build_allophone_arrays

        pattern, _gather = build_allophone_arrays(
            indexer.language_allophones, 1, len(indexer.phonemes)
        )
        torch.manual_seed(5)
        allophone_matrices = torch.from_numpy(pattern) * (
            1.0 + 0.3 * torch.rand(*pattern.shape)
        )
        model_state["_projection._layers.phoneme._allophone_layer._allophone_matrices"] = (
            allophone_matrices
        )

    composition_weight = None
    if composition:
        # EmbeddingBag table matching the plan's expected row count.
        table = indexer.full_attributes.subset(
            indexer.phonemes.tolist(), list(indexer.composition_features)
        ).dense_feature_table
        num_categories = np.concatenate(([0], table.max(axis=0))) + 1
        composition_weight = torch.randn(int(num_categories.sum()), embedding_size)
        model_state[
            "_projection._layers.phoneme._composition_layer._attribute_embeddings.weight"
        ] = composition_weight

    from allophant_tpu.models.allophant import attribute_graph_from_config

    graph = attribute_graph_from_config(config, indexer)
    checkpoint_data = {
        "config": config.dump(),
        "allophant_version": "reference-test",
        "feature_size": 1,
        "sample_rate": 16000,
        "attribute_graph": graph.to_dict(),
        "epoch": {"epoch": 3, "global_step": 100, "step": 10},
        "phonetic_indexer_state": indexer.state().to_dict(),
        "dataset_meta_data": [],
        "model_state": model_state,
        "optimization_states": None,
        "history": [],
        "additional": None,
    }
    path = str(tmp_path / "allophant.pt")
    torch.save(checkpoint_data, path)
    return path, torch_encoder, torch_heads, composition_weight, indexer, allophone_matrices


class TestReferenceCheckpointRestore:
    def test_restore_and_numerical_parity(self, tmp_path):
        import torch

        path, torch_encoder, torch_heads, *_ = _make_reference_checkpoint(tmp_path)
        estimator, indexer = Estimator.restore(path, wav2vec2_architecture=TINY_ARCH, precision="float32")
        assert estimator.epoch.epoch == 3
        assert estimator.sample_rate == 16000

        rng = np.random.default_rng(3)
        samples = 800
        audio = rng.standard_normal((2, samples)).astype(np.float32)
        lengths = np.array([samples, samples - 200])
        for row, length in enumerate(lengths):
            audio[row, length:] = 0.0

        predictions = estimator.predict(Batch(audio, lengths, 0), log_probabilities=False)

        # Torch reference computation: zero-mean-unit-var norm -> encoder -> heads.
        attention_mask = (np.arange(samples)[None, :] < lengths[:, None]).astype(np.int64)
        normalized = np.zeros_like(audio)
        for row, length in enumerate(lengths):
            valid = audio[row, :length]
            normalized[row, :length] = (valid - valid.mean()) / np.sqrt(valid.var() + 1e-7)
        with torch.no_grad():
            hidden = torch_encoder(
                torch.from_numpy(normalized),
                attention_mask=torch.from_numpy(attention_mask),
                output_hidden_states=True,
            ).hidden_states[-1]
            expected_nasal = torch_heads["nasal"](hidden).numpy()

        # Our predict buckets audio to a static padded length; crop to torch's frames.
        ours = np.asarray(predictions.outputs["nasal"]).transpose(1, 0, 2)[:, : expected_nasal.shape[1]]
        frame_lengths = np.asarray(predictions.lengths)
        frame_mask = np.arange(expected_nasal.shape[1])[None, :] < frame_lengths[:, None]
        difference = np.abs(ours - expected_nasal)[frame_mask]
        assert difference.max() < 5e-4, f"max diff {difference.max()}"

    def test_decode_flow(self, tmp_path):
        path, *_ = _make_reference_checkpoint(tmp_path)
        estimator, indexer = Estimator.restore(path, wav2vec2_architecture=TINY_ARCH, precision="float32")
        audio = np.random.default_rng(0).standard_normal((1, 800)).astype(np.float32)
        batch = Batch(audio, np.array([800]), 0)
        predictions = estimator.predict(batch)

        decoders = feature_decoders(indexer.attributes, feature_names=["nasal", "phoneme"])
        for name, decoder in decoders.items():
            output = np.asarray(predictions.outputs[name]).transpose(1, 0, 2)
            hypotheses = decoder(output, np.asarray(predictions.lengths))
            assert len(hypotheses) == 1
            tokens = hypotheses[0][0].tokens
            # Tokens use the blank offset: valid ids are >= 1.
            assert (tokens >= 1).all()
            values = indexer.feature_values(name, tokens - 1)
            assert all(isinstance(value, str) for value in values)

    def test_restore_composition_checkpoint(self, tmp_path):
        import torch

        path, torch_encoder, torch_heads, composition_weight, build_indexer, _allo = _make_reference_checkpoint(
            tmp_path, composition=True
        )
        estimator, indexer = Estimator.restore(path, wav2vec2_architecture=TINY_ARCH, precision="float32")

        audio = np.random.default_rng(1).standard_normal((1, 800)).astype(np.float32)
        batch = Batch(audio, np.array([800]), 0)
        inventory = ["a", "i", "m"]
        matrix = indexer.composition_feature_matrix(inventory)
        predictions = estimator.predict(batch, matrix, log_probabilities=False)
        assert predictions.outputs["phoneme"].shape[-1] == len(inventory) + 1

        # Parity: torch composition math over the zero-shot inventory.
        normalized = (audio[0] - audio[0].mean()) / np.sqrt(audio[0].var() + 1e-7)
        with torch.no_grad():
            hidden = torch_encoder(
                torch.from_numpy(normalized[None]), output_hidden_states=True
            ).hidden_states[-1]
            projected = torch_heads["phoneme"](hidden).numpy()[0]
        table = np.asarray(matrix)
        num_categories = np.concatenate(
            ([0], np.asarray(estimator.variables["buffers"]["projection"]["composition_feature_table"]).max(axis=0))
        ) + 1
        offsets = num_categories.cumsum()[:-1]
        weights = composition_weight.numpy()
        composed = weights[table + offsets[None, :]].sum(1)
        composed = np.concatenate((weights[0][None], composed), 0)
        embedding_size = weights.shape[1]
        expected = projected @ composed.T / np.sqrt(embedding_size)

        ours = np.asarray(predictions.outputs["phoneme"]).transpose(1, 0, 2)[0]
        np.testing.assert_allclose(ours[: expected.shape[0]], expected, atol=5e-4)


def _norm_and_encode(torch_encoder, audio, lengths):
    """Torch-side preprocessing + encoder shared by the parity tests."""
    import torch

    samples = audio.shape[1]
    attention_mask = (np.arange(samples)[None, :] < lengths[:, None]).astype(np.int64)
    normalized = np.zeros_like(audio)
    for row, length in enumerate(lengths):
        valid = audio[row, :length]
        normalized[row, :length] = (valid - valid.mean()) / np.sqrt(valid.var() + 1e-7)
    with torch.no_grad():
        return torch_encoder(
            torch.from_numpy(normalized),
            attention_mask=torch.from_numpy(attention_mask),
            output_hidden_states=True,
        ).hidden_states[-1]


class TestHierarchicalAttentionCheckpoint:
    def test_restore_attention_and_dependency_parity(self, tmp_path):
        """Exercises the remaining convert_reference_model_state branches: a
        ProjectingMultiheadAttention time layer (packed torch in_proj split into
        q/k/v) and a hierarchical phoneme head consuming softmaxed dependency
        logits (reference acoustic_model.py:362-461, 494-514)."""
        import torch

        path, torch_encoder, torch_heads, _cw, _idx, _allo = _make_reference_checkpoint(
            tmp_path, attention_heads={"nasal": 3}, phoneme_dependencies=["OUTPUT", "nasal"]
        )
        estimator, _indexer = Estimator.restore(path, wav2vec2_architecture=TINY_ARCH, precision="float32")

        rng = np.random.default_rng(5)
        samples = 800
        audio = rng.standard_normal((2, samples)).astype(np.float32)
        lengths = np.array([samples, samples - 200])
        for row, length in enumerate(lengths):
            audio[row, length:] = 0.0

        predictions = estimator.predict(Batch(audio, lengths, 0), log_probabilities=False)
        frame_lengths = np.asarray(predictions.lengths)

        hidden = _norm_and_encode(torch_encoder, audio, lengths)
        frames = hidden.shape[1]
        valid = torch.arange(frames)[None, :] < torch.from_numpy(frame_lengths[:, None])
        with torch.no_grad():
            # Reference layout is time-first into nn.MultiheadAttention.
            nasal = torch_heads["nasal"](hidden.transpose(0, 1), ~valid).transpose(0, 1)
            concat = torch.cat((hidden, torch.softmax(nasal, -1)), -1)
            phoneme = torch_heads["phoneme"](concat)

        frame_mask = valid.numpy()
        for name, expected in (("nasal", nasal.numpy()), ("phoneme", phoneme.numpy())):
            ours = np.asarray(predictions.outputs[name]).transpose(1, 0, 2)[:, :frames]
            difference = np.abs(ours - expected)[frame_mask]
            assert difference.max() < 2e-3, f"{name}: max diff {difference.max()}"


class TestAllophoneCheckpoint:
    def test_restore_allophone_checkpoint(self, tmp_path):
        """convert_reference_model_state's allophone branch: matrices restore
        exactly, predict passes raw phone logits through (reference
        acoustic_model.py:161-167), and map_allophones reproduces the masked
        max-pool semantics (:75-87) with the restored weights."""
        import torch

        from allophant_tpu.models.projection import build_allophone_arrays

        path, torch_encoder, torch_heads, _cw, _idx, allophone_matrices = (
            _make_reference_checkpoint(tmp_path, phoneme_layer="allophones")
        )
        estimator, indexer = Estimator.restore(path, wav2vec2_architecture=TINY_ARCH, precision="float32")

        restored = np.asarray(
            estimator.variables["params"]["projection"]["allophone"]["allophone_matrices"]
        )
        expected_matrices = allophone_matrices.numpy()
        np.testing.assert_allclose(restored, expected_matrices, atol=1e-6)

        # Predict mode: the phone head's raw logits pass through as both tasks.
        audio = np.random.default_rng(6).standard_normal((1, 800)).astype(np.float32)
        predictions = estimator.predict(Batch(audio, np.array([800]), 0), log_probabilities=False)
        hidden = _norm_and_encode(torch_encoder, audio, np.array([800]))
        with torch.no_grad():
            expected_phone = torch_heads["phoneme"](hidden).numpy()
        for name in ("phone", "phoneme"):
            ours = np.asarray(predictions.outputs[name]).transpose(1, 0, 2)
            difference = np.abs(ours[:, : expected_phone.shape[1]] - expected_phone)
            assert difference.max() < 5e-4, f"{name}: max diff {difference.max()}"

        # Training-mode mapping with the restored weights matches the reference's
        # multiply -> mask -> max-over-phones formulation.
        pattern = (
            build_allophone_arrays(indexer.language_allophones, 1, len(indexer.phonemes))[0] != 0
        )
        rng = np.random.default_rng(7)
        time, batch = 4, 2
        num_shared = expected_matrices.shape[1]
        language_ids = np.array([0, 1])
        phone_logits = rng.standard_normal((time, batch, num_shared)).astype(np.float32)
        mapped = np.asarray(estimator.map_allophones(phone_logits, language_ids))
        for row, language in enumerate(language_ids):
            matrix = expected_matrices[language]
            for t in range(time):
                products = phone_logits[t, row][:, None] * matrix
                for phoneme in range(matrix.shape[1]):
                    allophones = pattern[language][:, phoneme]
                    if allophones.any():
                        expected_value = products[allophones, phoneme].max()
                        assert mapped[t, row, phoneme] == pytest.approx(expected_value, rel=1e-4)
                    else:
                        # Reference fills with -FLT_MAX; we use -1e9 (same zero
                        # probability after softmax, finite CTC gradients).
                        assert mapped[t, row, phoneme] <= -1e8


class TestNativeCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        config = Config.load(mini_config_dict(model_type="wav2vec2"))
        inventories = LanguageInventories({0: ["a", "b", "t"]}, ["es"])
        indexer = PhoneticAttributeIndexer.from_config(config, mini_allophoible_csv(), inventories)
        from allophant_tpu.models.allophant import attribute_graph_from_config

        graph = attribute_graph_from_config(config, indexer)
        estimator = Estimator.from_config(
            config, 1, 16000, graph, indexer, TINY_ARCH, load_pretrained_weights=False
        )
        estimator.epoch.epoch = 7

        path = str(tmp_path / "native.ckpt")
        estimator.save(path, phonetic_indexer_state=indexer.state())
        restored, restored_indexer = Estimator.restore(path, wav2vec2_architecture=TINY_ARCH, precision="float32")

        assert restored.epoch.epoch == 7
        assert restored_indexer.phonemes.tolist() == indexer.phonemes.tolist()
        # Identical parameters -> identical predictions.
        audio = np.random.default_rng(0).standard_normal((1, 640)).astype(np.float32)
        batch = Batch(audio, np.array([640]), 0)
        original = estimator.predict(batch)
        roundtrip = restored.predict(batch)
        np.testing.assert_allclose(
            np.asarray(original.outputs["phoneme"]),
            np.asarray(roundtrip.outputs["phoneme"]),
            atol=1e-6,
        )


class TestOrbaxCheckpoint:
    def test_orbax_roundtrip(self, tmp_path):
        import numpy as np
        from allophant_tpu.config import Config
        from allophant_tpu.models.allophant import attribute_graph_from_config
        from allophant_tpu.phonetics.features import PhoneticAttributeIndexer
        from allophant_tpu.training import checkpoint as checkpoint_module
        from allophant_tpu.training.estimator import Estimator

        config = Config.load(mini_config_dict())
        indexer = PhoneticAttributeIndexer.from_config(config, mini_allophoible_csv())
        estimator = Estimator.from_config(
            config, 1, 16_000, attribute_graph_from_config(config, indexer), indexer,
            load_pretrained_weights=False,
        )
        directory = str(tmp_path / "orbax_ckpt")
        checkpoint_module.save_orbax(
            checkpoint_module.Checkpoint(
                config=config,
                feature_size=1,
                sample_rate=16_000,
                attribute_graph=estimator.attribute_graph,
                epoch=checkpoint_module.EpochPosition(),
                phonetic_indexer_state=indexer.state(),
                variables=estimator.variables,
                optimizer_state=b"opaque-optimizer-bytes",
            ),
            directory,
        )
        restored_estimator, restored_indexer = Estimator.restore(directory, precision="float32")
        import jax

        for original, loaded in zip(
            jax.tree_util.tree_leaves(estimator.variables["params"]),
            jax.tree_util.tree_leaves(restored_estimator.variables["params"]),
        ):
            np.testing.assert_allclose(np.asarray(original), np.asarray(loaded))
        loaded_checkpoint = checkpoint_module.load_checkpoint(directory)
        assert loaded_checkpoint.optimizer_state == b"opaque-optimizer-bytes"


class TestPredictDecoded:
    """The fused serving step (one program: forward + per-head greedy decode +
    packed uint16 drain; estimator.predict_decoded) must reproduce the generic
    path's decoded tokens exactly — it is the predict CLI's default greedy
    route."""

    def _build(self, phoneme_layer="shared"):
        from allophant_tpu.models.allophant import attribute_graph_from_config

        config = Config.load(mini_config_dict(phoneme_layer=phoneme_layer))
        inventories = None
        if phoneme_layer == "allophones":
            inventories = LanguageInventories(
                {0: ["a", "b", "d", "t"], 1: ["a", "t", "s"]}, ["es", "it"]
            )
        indexer = PhoneticAttributeIndexer.from_config(
            config, mini_allophoible_csv(), inventories
        )
        estimator = Estimator.from_config(
            config, 1, 16_000, attribute_graph_from_config(config, indexer), indexer,
            load_pretrained_weights=False,
        )
        return estimator

    def _batch(self, rows=3):
        from allophant_tpu.data.batch import Batch

        rng = np.random.default_rng(1)
        audio = rng.standard_normal((rows, 1600)).astype(np.float32)
        lengths = np.full(rows, 1600, dtype=np.int32)
        lengths[-1] = 1100
        return Batch(audio, lengths, np.zeros(rows, dtype=np.int32))

    def test_matches_generic_greedy_decode(self):
        from allophant_tpu.ops.decode import GreedyCTCDecoder

        estimator = self._build()
        batch = self._batch()
        predictions = estimator.predict(batch, time_major=False)
        heads = tuple(sorted(predictions.outputs))
        grid, lengths = estimator.predict_decoded(batch, heads=heads)
        grid = np.asarray(grid)

        decoder = GreedyCTCDecoder()
        frame_lengths = np.asarray(predictions.lengths)
        for head_index, name in enumerate(heads):
            expected = decoder(np.asarray(predictions.outputs[name]), frame_lengths)
            lane = grid[head_index]
            for row in range(len(batch)):
                np.testing.assert_array_equal(
                    lane[row, 1 : 1 + lane[row, 0]].astype(np.int64),
                    expected[row][0].tokens,
                    err_msg=f"head {name} row {row}",
                )

    def test_int16_upload_packing_is_bit_exact(self, monkeypatch):
        """The serving upload halves its bytes by re-packing 16-bit-sourced
        audio (f32 ``i / 32768``, data/audio.py:55) to int16 and dequantizing
        on device. The packed route must be BIT-identical to the f32 upload —
        int16->f32 conversion is exact and 2^-15 is a power-of-two scale."""
        from allophant_tpu.training import estimator as estimator_module

        estimator = self._build()
        rng = np.random.default_rng(3)
        rows = 3
        ints = rng.integers(-32768, 32768, size=(rows, 1600), dtype=np.int16)
        audio = ints.astype(np.float32) / 32768.0
        lengths = np.full(rows, 1600, dtype=np.int32)
        lengths[-1] = 900
        batch = Batch(audio, lengths, np.zeros(rows, dtype=np.int32))

        packed = estimator_module._pack_audio_for_upload(audio)
        assert packed.dtype == np.int16
        np.testing.assert_array_equal(packed, ints)
        # Not exactly representable (resampled/float sources) -> unchanged f32.
        loose = audio + np.float32(1e-6)
        assert estimator_module._pack_audio_for_upload(loose) is loose

        out_packed = estimator.predict(batch, time_major=False)
        heads = tuple(sorted(out_packed.outputs))
        grid_packed = np.asarray(estimator.predict_decoded(batch, heads=heads)[0])

        monkeypatch.setattr(
            estimator_module, "_pack_audio_for_upload", lambda value: value
        )
        out_f32 = estimator.predict(batch, time_major=False)
        grid_f32 = np.asarray(estimator.predict_decoded(batch, heads=heads)[0])
        np.testing.assert_array_equal(grid_packed, grid_f32)
        for name in out_packed.outputs:
            np.testing.assert_array_equal(
                np.asarray(out_packed.outputs[name]), np.asarray(out_f32.outputs[name])
            )

    def test_fused_beam_matches_generic_beam_decode(self):
        """predict_beam_decoded (one program: forward + every head's beam
        search + backtrace) must reproduce the generic per-head
        DeviceBeamCTCDecoder path exactly — it is the predict CLI's
        ``-b N`` route."""
        from allophant_tpu.ops.decode import DeviceBeamCTCDecoder

        estimator = self._build()
        batch = self._batch()
        predictions = estimator.predict(batch, time_major=False)
        heads = tuple(sorted(predictions.outputs))
        collected, scores, _lengths = estimator.predict_beam_decoded(
            batch, heads=heads, beam_width=4
        )
        collected = np.asarray(collected).astype(np.int64)
        scores = np.asarray(scores)

        decoder = DeviceBeamCTCDecoder([], 4, 2)
        for head_index, name in enumerate(heads):
            expected = decoder.collect(
                decoder.dispatch(predictions.outputs[name], predictions.lengths)
            )
            got = decoder._assemble(collected[head_index], scores[head_index])
            for row in range(len(batch)):
                assert len(got[row]) == len(expected[row]), (name, row)
                for k in range(len(expected[row])):
                    np.testing.assert_array_equal(
                        got[row][k].tokens, expected[row][k].tokens,
                        err_msg=f"head {name} row {row} beam {k}",
                    )
                    np.testing.assert_allclose(
                        got[row][k].score, expected[row][k].score, rtol=1e-5
                    )

    def test_fused_beam_allophone_map_matches_generic(self):
        """Fused beam with the allophone map (the CLI's ``-b
        --language-phonemes`` combination) must decode the MAPPED log-probs
        for the phoneme head, like the generic path (reference
        estimator.py:1035-1046 + run.py:755-760)."""
        from allophant_tpu.config import ProjectionEntryConfig
        from allophant_tpu.ops.decode import DeviceBeamCTCDecoder

        estimator = self._build("allophones")
        import jax as jax_module

        def perturb(tree, path=()):
            if isinstance(tree, dict):
                return {key: perturb(value, path + (key,)) for key, value in tree.items()}
            if path and path[-1] == "allophone_matrices":
                noise = jax_module.random.uniform(
                    jax_module.random.PRNGKey(11), tree.shape, jnp.float32, 0.2, 2.0
                )
                return tree + noise
            return tree

        estimator.variables = perturb(estimator.variables)
        batch = self._batch()
        predictions = estimator.predict(batch, time_major=False)
        mapped = estimator.map_allophones(
            predictions.outputs[ProjectionEntryConfig.PHONE],
            batch.language_ids,
            time_major=False,
        )
        heads = (ProjectionEntryConfig.PHONEME_LAYER, ProjectionEntryConfig.PHONE)
        collected, scores, _lengths = estimator.predict_beam_decoded(
            batch, heads=heads, beam_width=4, map_allophones=True
        )
        collected = np.asarray(collected).astype(np.int64)
        scores = np.asarray(scores)

        decoder = DeviceBeamCTCDecoder([], 4, 2)
        expected = decoder.collect(decoder.dispatch(mapped, predictions.lengths))
        got = decoder._assemble(collected[0], scores[0])
        for row in range(len(batch)):
            np.testing.assert_array_equal(
                got[row][0].tokens, expected[row][0].tokens,
                err_msg=f"mapped phoneme row {row}",
            )

    def test_allophone_map_matches_predict_path(self):
        estimator = self._build("allophones")
        # Perturb the allophone matrices away from initialization: the learned
        # max-pool weights make the mapped argmax sensitive to whether log-probs
        # or raw logits are mapped (the fused path must map log-probs, like the
        # generic path and the reference) — with untrained matrices the two are
        # indistinguishable and this test would prove nothing.
        import jax as jax_module

        def perturb(tree, path=()):
            if isinstance(tree, dict):
                return {key: perturb(value, path + (key,)) for key, value in tree.items()}
            if path and path[-1] == "allophone_matrices":
                noise = jax_module.random.uniform(
                    jax_module.random.PRNGKey(7), tree.shape, jnp.float32, 0.2, 2.0
                )
                return tree + noise
            return tree

        estimator.variables = perturb(estimator.variables)
        batch = self._batch()
        predictions = estimator.predict(batch, time_major=False)
        from allophant_tpu.config import ProjectionEntryConfig

        mapped = estimator.map_allophones(
            predictions.outputs[ProjectionEntryConfig.PHONE],
            batch.language_ids,
            time_major=False,
        )
        heads = (ProjectionEntryConfig.PHONEME_LAYER, ProjectionEntryConfig.PHONE)
        grid, _lengths = estimator.predict_decoded(
            batch, heads=heads, map_allophones=True
        )
        grid = np.asarray(grid)

        from allophant_tpu.ops.decode import GreedyCTCDecoder

        decoder = GreedyCTCDecoder()
        expected = decoder(np.asarray(mapped), np.asarray(predictions.lengths))
        lane = grid[0]
        for row in range(len(batch)):
            np.testing.assert_array_equal(
                lane[row, 1 : 1 + lane[row, 0]].astype(np.int64),
                expected[row][0].tokens,
                err_msg=f"mapped phoneme row {row}",
            )
