"""Integration tests for the full Allophant model (acoustic encoder + hierarchical
head) across its three phoneme-layer variants, under jit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from allophant_tpu.config import Config
from allophant_tpu.models.allophant import attribute_graph_from_config, build_model, inject_static_data
from allophant_tpu.models.wav2vec2 import Wav2Vec2Architecture
from allophant_tpu.phonetics.features import LanguageInventories, PhoneticAttributeIndexer

from fixtures import CLASSIFIER_FEATURES, mini_allophoible_csv, mini_config_dict

TINY_W2V = Wav2Vec2Architecture(
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=48,
    conv_dim=(12, 16),
    conv_kernel=(4, 3),
    conv_stride=(2, 2),
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
    hidden_dropout=0.0,
    activation_dropout=0.0,
    attention_dropout=0.0,
)


@pytest.fixture(scope="module")
def table_csv():
    return mini_allophoible_csv()


def _build(table_csv, phoneme_layer, composition, model_type="wav2vec2"):
    config = Config.load(
        mini_config_dict(
            phoneme_layer=phoneme_layer, embedding_composition=composition, model_type=model_type
        )
    )
    inventories = LanguageInventories({0: ["a", "b", "d", "t"], 1: ["a", "t", "s"]}, ["es", "it"])
    indexer = PhoneticAttributeIndexer.from_config(config, table_csv, inventories)
    graph = attribute_graph_from_config(config, indexer)
    built = build_model(
        config.nn,
        feature_size=1,
        sample_rate=16_000,
        attribute_graph=graph,
        attribute_indexer=indexer,
        wav2vec2_architecture=TINY_W2V if model_type == "wav2vec2" else None,
    )
    variables = built.init(jax.random.PRNGKey(0), sample_batch_size=1, sample_length=320)
    return config, indexer, built, variables


def _sample_batch(batch=2, samples=320):
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((batch, samples)).astype(np.float32)
    lengths = np.array([samples, samples - 60])[:batch]
    language_ids = np.array([0, 1])[:batch]
    return jnp.asarray(audio), jnp.asarray(lengths), jnp.asarray(language_ids)


class TestHiddenStateCollection:
    def test_final_only_matches_collect_all(self):
        """collect_all=False returns exactly the final hidden state of the full
        stack (same parameter tree), never materializing the [L, B, T, D]
        stacked buffer."""
        from allophant_tpu.models.wav2vec2 import Wav2Vec2Model

        model_all = Wav2Vec2Model(TINY_W2V)
        model_final = Wav2Vec2Model(TINY_W2V, collect_all=False)
        rng = np.random.default_rng(0)
        audio = jnp.asarray(rng.standard_normal((2, 320)).astype(np.float32))
        lengths = jnp.asarray([320, 260])
        variables = model_all.init(jax.random.PRNGKey(0), audio, lengths)
        # Identical parameter trees: the flag only changes scan outputs.
        final_variables = model_final.init(jax.random.PRNGKey(0), audio, lengths)
        assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(
            final_variables
        )

        states_all, lengths_all = model_all.apply(variables, audio, lengths)
        states_final, lengths_final = model_final.apply(variables, audio, lengths)
        assert len(states_all) == TINY_W2V.num_hidden_layers + 1
        assert len(states_final) == 1
        np.testing.assert_array_equal(np.asarray(lengths_all), np.asarray(lengths_final))
        np.testing.assert_allclose(
            np.asarray(states_final[-1]), np.asarray(states_all[-1]), rtol=1e-6, atol=1e-6
        )

    def test_plan_gates_collection(self, table_csv):
        """Models whose heads only consume the final OUTPUT skip per-layer
        collection; an OUTPUT_<i> dependency keeps it."""
        from allophant_tpu.models.allophant import needs_intermediate_taps

        _config, _indexer, built, variables = _build(table_csv, "shared", composition=False)
        assert not needs_intermediate_taps(built.model.plan)

        config_dict = mini_config_dict(phoneme_layer="shared", embedding_composition=False)
        config_dict["nn"]["projection"]["classes"][0]["dependencies"] = ["OUTPUT_1"]
        config = Config.load(config_dict)
        inventories = LanguageInventories(
            {0: ["a", "b", "d", "t"], 1: ["a", "t", "s"]}, ["es", "it"]
        )
        indexer = PhoneticAttributeIndexer.from_config(config, mini_allophoible_csv(), inventories)
        graph = attribute_graph_from_config(config, indexer)
        tapped = build_model(
            config.nn,
            feature_size=1,
            sample_rate=16_000,
            attribute_graph=graph,
            attribute_indexer=indexer,
            wav2vec2_architecture=TINY_W2V,
        )
        assert needs_intermediate_taps(tapped.model.plan)
        # The tapped model still runs end to end (collects per-layer states).
        tapped_variables = tapped.init(jax.random.PRNGKey(0), sample_batch_size=1, sample_length=320)
        audio, lengths, language_ids = _sample_batch()
        predictions = tapped.model.apply(tapped_variables, audio, lengths, language_ids)
        assert np.isfinite(np.asarray(predictions.outputs["phoneme"])).all()


class TestSharedModel:
    def test_forward_shapes(self, table_csv):
        config, indexer, built, variables = _build(table_csv, "shared", composition=False)
        audio, lengths, language_ids = _sample_batch()
        predictions = built.model.apply(variables, audio, lengths, language_ids)
        # One output per classifier node; each [B, T', size + blank].
        assert set(predictions.outputs) == set(CLASSIFIER_FEATURES) | {"phoneme"}
        frames = int(np.asarray(predictions.lengths).max())
        for name in CLASSIFIER_FEATURES:
            expected = indexer.size(name) + 1
            assert predictions.outputs[name].shape == (2, predictions.outputs[name].shape[1], expected)
        assert predictions.outputs["phoneme"].shape[-1] == len(indexer.phonemes) + 1
        assert frames <= predictions.outputs["phoneme"].shape[1]

    def test_jit_forward(self, table_csv):
        config, indexer, built, variables = _build(table_csv, "shared", composition=False)
        audio, lengths, language_ids = _sample_batch()

        @jax.jit
        def forward(variables, audio, lengths, language_ids):
            return built.model.apply(variables, audio, lengths, language_ids)

        predictions = forward(variables, audio, lengths, language_ids)
        assert np.isfinite(np.asarray(predictions.outputs["phoneme"])).all()

    def test_l2_penalty_none_for_shared(self, table_csv):
        config, indexer, built, variables = _build(table_csv, "shared", composition=False)
        penalty = built.model.apply(variables, method="l2_penalty")
        assert penalty is None


class TestAllophoneModel:
    def test_forward_training_and_predict(self, table_csv):
        config, indexer, built, variables = _build(table_csv, "allophones", composition=False)
        audio, lengths, language_ids = _sample_batch()

        training = built.model.apply(variables, audio, lengths, language_ids)
        shared_count = len(indexer.language_allophones.shared_phones)
        phoneme_count = len(indexer.phonemes)
        # Training: phoneme output pooled over allophones.
        assert training.outputs["phoneme"].shape[-1] == phoneme_count + 1

        predicting = built.model.apply(variables, audio, lengths, language_ids, predict=True)
        # Predict: raw phone logits pass through as both phone and phoneme.
        assert predicting.outputs["phone"].shape[-1] == shared_count + 1
        assert predicting.outputs["phoneme"].shape[-1] == shared_count + 1
        np.testing.assert_array_equal(
            np.asarray(predicting.outputs["phone"]), np.asarray(predicting.outputs["phoneme"])
        )

    def test_allophone_pooling_semantics(self, table_csv):
        config, indexer, built, variables = _build(table_csv, "allophones", composition=False)
        audio, lengths, language_ids = _sample_batch()
        training = built.model.apply(variables, audio, lengths, language_ids)
        predicting = built.model.apply(variables, audio, lengths, language_ids, predict=True)

        phone_logits = np.asarray(predicting.outputs["phone"])
        phoneme_logits = np.asarray(training.outputs["phoneme"])
        allophones = indexer.language_allophones

        # For Spanish (language 0): phoneme logit == max over its allophones of phone
        # logits (matrix weights are 1 at init).
        for phoneme_index, allophone_list in allophones.allophones[0].items():
            expected = phone_logits[0][:, np.asarray(allophone_list) + 1].max(-1)
            np.testing.assert_allclose(phoneme_logits[0][:, phoneme_index + 1], expected, rtol=1e-5)
        # Blank identity diagonal.
        np.testing.assert_allclose(phoneme_logits[0][:, 0], phone_logits[0][:, 0], rtol=1e-5)
        # Phonemes not in the language inventory get -inf-ish logits.
        spanish_phonemes = set(allophones.allophones[0].keys())
        missing = [
            index
            for index in range(len(indexer.phonemes))
            if index not in spanish_phonemes
        ]
        if missing:
            assert (phoneme_logits[0][:, np.asarray(missing) + 1] <= -1e8).all()

    def test_l2_penalty_zero_at_init_and_positive_after(self, table_csv):
        config, indexer, built, variables = _build(table_csv, "allophones", composition=False)
        penalty = built.model.apply(variables, method="l2_penalty")
        assert float(penalty) == 0.0
        # Perturb the matrices: penalty becomes the sum of Frobenius norms.
        import copy

        perturbed = jax.tree_util.tree_map(lambda x: x, variables)
        matrices = perturbed["params"]["projection"]["allophone"]["allophone_matrices"]
        perturbed["params"]["projection"]["allophone"]["allophone_matrices"] = matrices + 0.1
        penalty = built.model.apply(perturbed, method="l2_penalty")
        languages = matrices.shape[0]
        expected = sum(
            np.sqrt((0.1**2) * matrices.shape[1] * matrices.shape[2]) for _ in range(languages)
        )
        assert float(penalty) == pytest.approx(expected, rel=1e-5)


class TestCompositionModel:
    def test_zero_shot_inventory(self, table_csv):
        config, indexer, built, variables = _build(table_csv, "shared", composition=True)
        audio, lengths, language_ids = _sample_batch()

        # Default: training feature table.
        default = built.model.apply(variables, audio, lengths, language_ids, predict=True)
        assert default.outputs["phoneme"].shape[-1] == len(indexer.phonemes) + 1

        # Zero-shot: caller-supplied inventory matrix changes the output arity.
        inventory = ["a", "e", "i", "o", "u", "m"]
        matrix = indexer.composition_feature_matrix(inventory)
        zero_shot = built.model.apply(
            variables, audio, lengths, language_ids, target_feature_indices=jnp.asarray(matrix), predict=True
        )
        assert zero_shot.outputs["phoneme"].shape[-1] == len(inventory) + 1

    def test_composition_logits_formula(self, table_csv):
        config, indexer, built, variables = _build(table_csv, "shared", composition=True)
        audio, lengths, language_ids = _sample_batch(batch=1)
        predictions = built.model.apply(variables, audio, lengths, language_ids, predict=True)

        # Recompute: logits = inputs @ [blank; sum-of-category-embeddings].T / sqrt(E)
        table = np.asarray(variables["buffers"]["projection"]["composition_feature_table"])
        embeddings = np.asarray(variables["params"]["projection"]["composition"]["attribute_embeddings"])
        offsets = np.asarray(built.model.plan.composition[2])
        composed = embeddings[table + offsets[None, :]].sum(1)
        composed = np.concatenate((embeddings[0][None], composed), 0)
        assert predictions.outputs["phoneme"].shape[-1] == composed.shape[0]


class TestTransformerModel:
    def test_from_scratch_transformer(self, table_csv):
        config, indexer, built, variables = _build(
            table_csv, "shared", composition=False, model_type="pre-ln-transformer"
        )
        # Feature input: [B, T, F] with F = 1 raw feature (for test purposes).
        rng = np.random.default_rng(0)
        features = jnp.asarray(rng.standard_normal((2, 50, 1)).astype(np.float32))
        lengths = jnp.asarray([50, 30])
        language_ids = jnp.asarray([0, 1])
        predictions = built.model.apply(variables, features, lengths, language_ids)
        assert predictions.outputs["phoneme"].shape[1] == 50
        assert np.isfinite(np.asarray(predictions.outputs["phoneme"])).all()


class TestDependencyValidation:
    def test_unknown_dependency_raises(self):
        """A misspelled dependency must fail at graph-construction time with a
        clear error, not as an opaque KeyError (previously
        ``KeyError: 'phonme'`` from the edge-resolution comprehension)."""
        import pytest

        from allophant_tpu.phonetics.attribute_graph import AttributeGraph, AttributeNode

        with pytest.raises(ValueError, match="phonme"):
            AttributeGraph(
                [
                    AttributeNode("phoneme", 5, dependencies=["OUTPUT"]),
                    AttributeNode("nasal", 3, dependencies=["phonme"]),  # typo
                ]
            )
