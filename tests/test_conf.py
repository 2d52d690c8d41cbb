"""Config system tests: YAML union, typed overrides, immutability, hashing."""

import pytest

from pydreamer_tpu.conf import Conf, build_conf, parse_args, read_yamls

CONFIG_DIR = "config"


class TestYamlUnion:
    def test_sections_load(self):
        sections = read_yamls(CONFIG_DIR)
        assert "defaults" in sections
        assert "atari" in sections
        assert "debug" in sections

    def test_union_left_to_right(self):
        d = build_conf(CONFIG_DIR, ["defaults"])
        assert d["deter_dim"] == 2048
        d = build_conf(CONFIG_DIR, ["defaults", "atari"])
        assert d["deter_dim"] == 1024      # atari overrides
        assert d["batch_length"] == 48     # defaults kept
        d = build_conf(CONFIG_DIR, ["defaults", "atari", "debug"])
        assert d["batch_length"] == 15     # debug overrides again

    def test_unknown_section_raises(self):
        with pytest.raises(KeyError):
            build_conf(CONFIG_DIR, ["defaults", "nonexistent"])

    def test_all_presets_union_cleanly(self):
        """Every section in every YAML introduces only keys declared in
        defaults — the contract that makes each key a typed CLI flag
        (reference: launch.py:33-41 relies on the same invariant)."""
        sections = read_yamls(CONFIG_DIR)
        default_keys = set(sections["defaults"])
        for name, section in sections.items():
            if name == "defaults":
                continue
            merged = build_conf(CONFIG_DIR, ["defaults", name])
            extra = set(section) - default_keys
            assert not extra, f"section {name!r} has undeclared keys {extra}"
            assert merged["batch_length"] > 0

    def test_experiment_presets(self):
        d = build_conf(CONFIG_DIR, ["defaults", "atari", "atari_pong"])
        assert d["env_id"] == "Atari-Pong" and d["n_env_steps"] == 20_000_000
        d = build_conf(CONFIG_DIR, ["defaults", "dmc", "dmc_walker_run"])
        assert d["env_id"] == "DMC-walker_run" and d["action_dim"] == 6
        d = build_conf(CONFIG_DIR, ["defaults", "minerl"])
        assert d["stoch_dim"] == 96 and d["batch_length"] == 16
        d = build_conf(CONFIG_DIR, ["defaults", "miniworld_offline"])
        assert d["probe_model"] == "goals" and d["imag_horizon"] == 1


class TestCli:
    def test_parse_with_overrides(self):
        conf = parse_args(
            ["--configs", "defaults", "atari",
             "--batch_size", "7", "--layer_norm", "false",
             "--adam_lr", "1e-5"],
            config_dir=CONFIG_DIR)
        assert conf.batch_size == 7
        assert conf.layer_norm is False
        assert conf.adam_lr == pytest.approx(1e-5)
        assert conf.env_id == "Atari-Pong"

    def test_every_key_becomes_flag(self):
        conf = parse_args(["--configs", "defaults", "--n_steps", "123"],
                          config_dir=CONFIG_DIR)
        assert conf.n_steps == 123

    def test_untyped_and_list_overrides(self):
        """None-typed YAML keys must be coerced, not kept as raw strings, and
        list syntax must yaml-parse instead of char-splitting."""
        conf = parse_args(
            ["--configs", "defaults",
             "--reward_decoder_categorical", "[-10,-1,0,1,10]",
             "--clip_rewards", "tanh",
             "--offline_data_dir", "/tmp/data",
             "--env_id", "Atari-Pong"],
            config_dir=CONFIG_DIR)
        assert conf.reward_decoder_categorical == (-10, -1, 0, 1, 10) or \
            list(conf.reward_decoder_categorical) == [-10, -1, 0, 1, 10]
        assert conf.clip_rewards == "tanh"
        assert conf.offline_data_dir == "/tmp/data"
        assert conf.env_id == "Atari-Pong"


class TestConfObject:
    def test_immutable(self):
        c = Conf({"a": 1})
        with pytest.raises(AttributeError):
            c.a = 2

    def test_hashable_and_replace(self):
        c1 = Conf({"a": 1, "b": "x"})
        c2 = Conf({"a": 1, "b": "x"})
        assert hash(c1) == hash(c2) and c1 == c2
        c3 = c1.replace(a=2)
        assert c3.a == 2 and c1.a == 1

    def test_pickle_roundtrip(self):
        import pickle
        c = Conf({"a": 1, "b": [1, 2]})
        c2 = pickle.loads(pickle.dumps(c))
        assert c2 == c

    def test_get_and_contains(self):
        c = Conf({"a": 1})
        assert c.get("missing", 5) == 5
        assert "a" in c and "z" not in c
