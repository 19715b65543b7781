"""Orchestration-layer tests: CLI flag parity, checkpoint I/O, sweep-runner
resume semantics, observability counters, mesh construction.

Covers the reference's driver surface (`dev/py/run_local_ofdm.py`,
`dev/py/locals.py`, `tf.app.flags` parsing, TF1 Saver) that the experiment
scripts exercise only end-to-end on the chip.
"""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_ofdm_tpu import cli
from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
from dl_ofdm_tpu.train import checkpoint as ckpt


def _parse(argv):
    """Run cli's parser alone (no command execution)."""
    import argparse
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    for name in ("train", "equalizer", "baseline", "sweep"):
        p = sub.add_parser(name)
        cli._add_common(p)
    return parser.parse_args(argv)


class TestCLI:
    def test_flag_parity_defaults(self):
        args = _parse(["train"])
        cfg, tc = cli._configs(args)
        # reference defaults: ofdmreceiver_np.py:30-53
        assert cfg == OFDMConfig()
        assert tc.snr == 3.0 and tc.batch_size == 512
        assert tc.early_stop == 100 and tc.init_learning == 1e-3

    def test_bool_strings_parse_like_tf_flags(self):
        args = _parse(["train", "--cp=False", "--longcp=false",
                       "--mobile=True"])
        cfg, _ = cli._configs(args)
        assert cfg.cp is False and cfg.longcp is False
        assert args.mobile is True

    def test_full_flag_roundtrip(self):
        args = _parse([
            "equalizer", "--nbits=2", "--nfft=128", "--SNR=7.5",
            "--channel=mixRayleigh", "--opt=3", "--token=tok",
            "--save_dir=/tmp/x", "--max_epoch_num=17"])
        cfg, tc = cli._configs(args)
        assert cfg.nbits == 2 and cfg.nfft == 128
        assert tc.snr == 7.5 and tc.opt == 3 and tc.token == "tok"
        assert tc.save_dir == "/tmp/x" and tc.max_epoch_num == 17


class TestCheckpoint:
    def test_token_name_schema(self):
        # run_local_ofdm.py:77,104 naming
        assert (ckpt.token_name("OFDM_Dense3", 1, 5.0, True)
                == "OFDM_Dense3_1mod_snr5_cpTrue")
        assert (ckpt.token_name("OFDM_Dense3", 1, 5.0, True, opt=2,
                                channel="mixRayleigh")
                == "OFDM_Dense3_1mod_snr5_cpTrue_Equalizer2_mixRayleigh")
        # opt=0 (the default equalizer) must keep its digit — regression for
        # the falsy-zero bug that produced '_Equalizer_mixRayleigh'
        assert (ckpt.token_name("OFDM_Dense3", 1, 5.0, True, opt=0,
                                channel="mixRayleigh")
                == "OFDM_Dense3_1mod_snr5_cpTrue_Equalizer0_mixRayleigh")

    def test_save_restore_roundtrip(self, tmp_path):
        from dl_ofdm_tpu.train.loop import Trainer
        cfg = OFDMConfig(nbits=1)
        tc = TrainConfig(batch_size=14, msg_length=98)
        tr = Trainer(cfg, tc, channel="AWGN")
        state = tr.init_state(jax.random.PRNGKey(3))
        path = ckpt.save(str(tmp_path / "tok"), state)

        # restore into a differently-initialized target: values must come back
        other = tr.init_state(jax.random.PRNGKey(4))
        restored = ckpt.restore(path, other)
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(restored.step) == int(state.step)


class TestRunnerResume:
    def test_sweep_skips_existing_csvs(self, tmp_path):
        """With every result CSV present, the full grid is a fast no-op
        (resume-by-existence parity, run_local_ofdm.py:82-90,110-118)."""
        from dl_ofdm_tpu.runner import run_sweep
        save_dir = str(tmp_path)
        result_dir = tmp_path / "results"
        result_dir.mkdir()
        for cp_suffix in ("", "_shortcp"):   # long- and short-CP grid arms
            for nbits in (1, 2, 3, 4):
                for cp in (False, True):
                    tok = f"OFDM_Dense3_{nbits}mod_snr{5 * nbits}_cp{cp}{cp_suffix}"
                    (result_dir / f"Test_DCCN_{tok}_AWGN.csv").write_text("x")
            for cp in (True, False):
                tok = f"OFDM_Dense3_1mod_snr5_cp{cp}{cp_suffix}"
                (result_dir /
                 f"Test_DCCN_{tok}_Equalizer0_mixRayleigh_test_chan_Custom.csv"
                 ).write_text("x")
        logs = []
        run_sweep(awgn=True, save_dir=save_dir, quick=True,
                  log_fn=logs.append)
        assert logs and all("skip" in line for line in logs)
        # nothing trained: no checkpoints appeared
        assert not glob.glob(os.path.join(save_dir, "OFDM_Dense3*"))


class TestObservability:
    def test_throughput_counter(self):
        """Fenced stages report under their own name; unfenced (dispatch-
        only) stages are quarantined under '<name>(host)' — on the axon
        backend un-fenced wall-clock measures dispatch rate, not device
        throughput (utils/timing.py)."""
        import jax.numpy as jnp

        from dl_ofdm_tpu.utils.observability import Throughput
        tp = Throughput()
        out = jnp.ones((4,)) * 2.0
        with tp.stage("channel", 1000) as s:
            s.fence(out)
        with tp.stage("channel", 500) as s:
            s.fence(out)
        with tp.stage("host_prep", 100):
            pass
        rep = tp.report()
        assert rep["channel"] > 0 and tp.samples["channel"] == 1500
        assert "host_prep" not in rep and rep["host_prep(host)"] > 0

    def test_constellation_dump_schema(self, tmp_path):
        from dl_ofdm_tpu.utils.observability import dump_constellation
        tx = np.random.default_rng(0).normal(size=(64, 2))
        rx = tx + 0.1
        paths = dump_constellation("tok", tx, rx, out_dir=str(tmp_path))
        assert [os.path.basename(p) for p in paths] == [
            "tok_txiq.csv", "tok_rxiq.csv"]
        back = np.loadtxt(paths[0], delimiter=",")
        np.testing.assert_allclose(back, tx.astype(np.float16), atol=1e-3)


class TestMesh:
    def test_make_mesh_rejects_bad_factorization(self):
        from dl_ofdm_tpu.parallel.mesh import make_mesh
        with pytest.raises(ValueError):
            make_mesh(jax.devices()[:3], tp=2)

    def test_small_layers_stay_replicated(self):
        """Sharding rules drop axes that don't divide the mesh size."""
        from jax.sharding import PartitionSpec as P
        from dl_ofdm_tpu.parallel.mesh import make_mesh, shard_params
        mesh = make_mesh(jax.devices()[:8], tp=4)
        params = {"fft_like": {"wr": jnp.zeros((64, 64)),   # 64 % 4 == 0
                               "br": jnp.zeros((3,))}}      # 3 % 4 != 0
        out = shard_params(mesh, params)
        wr_spec = out["fft_like"]["wr"].sharding.spec
        br_spec = out["fft_like"]["br"].sharding.spec
        assert wr_spec == P(None, "tp")
        assert br_spec == P()


class TestArchiveRecovery:
    """Round-5 durability machinery: the committed `runs/arms/` archives are
    the source of truth across round-boundary checkpoint cleanups
    (CLAUDE.md; reference checkpoint-name schema
    `dev/py/ofdmreceiver_np_mp.py:349-352`)."""

    def _import_from(self, path, name):
        import importlib.util
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_ensure_awgn_base_restores_committed_archive(
            self, tmp_path, monkeypatch):
        """A cleaned base checkpoint dir is rebuilt from the committed npz
        archive instead of retraining (run_experiments8.ensure_awgn_base)."""
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        r8 = self._import_from(
            os.path.join(repo, "runs", "run_experiments8.py"), "_r8_test")
        monkeypatch.setattr(r8, "RUNS", str(tmp_path))
        token = r8.base_token(1, 5.0, True)
        # commit an "archive": freshly initialized params for this config
        from dl_ofdm_tpu.train.loop import Trainer
        tr = Trainer(OFDMConfig(nbits=1),
                     TrainConfig(snr=5.0, batch_size=8, max_epoch_num=1,
                                 token=token, save_dir=str(tmp_path)),
                     channel="AWGN")
        params = tr.init_state(jax.random.PRNGKey(7)).params
        os.makedirs(tmp_path / "arms", exist_ok=True)
        ckpt.export_params_npz(str(tmp_path / "arms" / f"{token}.npz"),
                               params)
        # pre-seed the AWGN sweep CSV so no sweep (or training) runs
        (tmp_path / f"Test_DCCN_{token}_AWGN.csv").write_text("SNR,BER,Loss\n")
        _, _, restored = r8.ensure_awgn_base(nbits=1, snr=5.0, epochs=1)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(restored)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        # and the checkpoint dir is re-materialized for downstream restores
        assert (tmp_path / token).is_dir()

    def test_export_arms_role_prefers_p19_markers(self, tmp_path,
                                                  monkeypatch):
        """Manifest provenance: a phase-19 marker whose saved_as names the
        canonical dir overrides the stale round-4 p17 provenance (the
        continuation-rebuilt arm must not be labeled as the gate-failed
        tail rebuild)."""
        import json as _json
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ea = self._import_from(
            os.path.join(repo, "scripts", "export_arms.py"), "_ea_test")
        monkeypatch.setattr(ea, "RUNS", str(tmp_path))
        base = "OFDM_Dense3_2mod_snr10_cpTrue"
        name = f"{base}_Equalizer12_mixRayleigh_mobile"
        (tmp_path / f"p17_rebuild_{base}_mobile.json").write_text(
            _json.dumps({"recipe": "fresh600_tail_curriculum",
                         "gate_pass": False, "saved_as": name}))
        # stale p17 provenance alone -> tail-tagged, gate FAIL
        role = ea._role(name)
        assert role["gate_pass"] is False
        assert role["sweep_tag"] == "mixRayleighTail"
        # a later gate-PASS p19 marker for the same canonical name wins
        (tmp_path / f"p19_zfcontinue_{base}_s121.json").write_text(
            _json.dumps({"recipe": "static_to_mobile_continuation300",
                         "gate_pass": True, "saved_as": name}))
        role = ea._role(name)
        assert role["recipe"] == "static_to_mobile_continuation300"
        assert role["gate_pass"] is True
        assert role["sweep_tag"] == "mixRayleigh"
        # an aside-saved (gate FAIL) p19 marker does NOT claim the dir
        (tmp_path / f"p19_zfrebuild_{base}_s101.json").write_text(
            _json.dumps({"recipe": "fresh600_standard_curriculum_joint_zf",
                         "gate_pass": False, "saved_as": name + "_r5s101"}))
        role = ea._role(name)
        assert role["recipe"] == "static_to_mobile_continuation300"
