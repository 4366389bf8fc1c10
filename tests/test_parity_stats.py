"""The parity gate's statistical decision rule (VERDICT r4 next-step #5).

The protocol estimator is stochastic (n_round re-seeded rounds, seed
grids on tune suites; reference models/trainer.py:334-351), so the gate
must be an equivalence test with a power statement, not a point check.
These tests pin the scraper (per-round metrics grouped into runs), the
spread estimators, the TOST verdicts on crafted cases, and the CLI's
exit-code contract (0 equivalent / 1 different / 2 inconclusive).
"""

import math
import subprocess
import sys

import numpy as np
import pytest

from mst_tpu.evaluator import parity_stats
from mst_tpu.evaluator.logs import extract_runs_with_rounds


def _log(rounds_list):
    """Render Experiment-style stdout for a list of runs, each a list of
    (ade, fde) rounds (byte-identical format, trainer.py:1005-1011)."""
    out = []
    for rounds in rounds_list:
        for i, (a, f) in enumerate(rounds):
            out.append(f"Round {i}: \nTest ADE: {a} \nTest FDE: {f}")
        avg_a = sum(a for a, _ in rounds) / len(rounds)
        avg_f = sum(f for _, f in rounds) / len(rounds)
        out.append(f"\nAverage performance (by {len(rounds)}): "
                   f"\nTest ADE: {avg_a} \nTest FDE: {avg_f}")
    return "\n".join(out)


class TestScraper:
    def test_rounds_grouped_into_runs(self):
        text = _log([[(10.0, 20.0), (11.0, 21.0), (12.0, 22.0)],
                     [(30.0, 40.0), (31.0, 41.0)]])
        runs = extract_runs_with_rounds(text)
        assert len(runs) == 2
        assert runs[0]["round_ade"] == [10.0, 11.0, 12.0]
        assert runs[0]["ade"] == pytest.approx(11.0)
        assert runs[1]["round_fde"] == [40.0, 41.0]
        assert runs[1]["fde"] == pytest.approx(40.5)

    def test_empty_log(self):
        assert extract_runs_with_rounds("no metrics here") == []
        assert parity_stats.suite_stats("nothing") is None


class TestSuiteStats:
    def test_single_run_se_from_rounds(self):
        """Generalize suite: one run, SE = round spread / sqrt(n_round)."""
        rounds = [(10.0, 20.0), (11.0, 21.0), (12.0, 22.0)]
        st = parity_stats.suite_stats(_log([rounds]))
        assert st["n_runs"] == 1 and st["n_rounds"] == 3
        assert st["ade"] == pytest.approx(11.0)
        assert st["ade_se"] == pytest.approx(
            np.std([10, 11, 12], ddof=1) / math.sqrt(3))
        assert st["df"] == 2

    def test_multi_run_se_from_run_spread(self):
        """Tune grid: SE from across-run spread (seed + training noise),
        not the pooled rounds."""
        runs = [[(10.0, 20.0)] * 3, [(14.0, 24.0)] * 3,
                [(12.0, 22.0)] * 3]
        st = parity_stats.suite_stats(_log(runs))
        assert st["n_runs"] == 3
        assert st["ade"] == pytest.approx(12.0)
        assert st["ade_se"] == pytest.approx(
            np.std([10, 14, 12], ddof=1) / math.sqrt(3))
        assert st["df"] == 2


class TestEquivalence:
    def test_equivalent_when_ci_inside_margin(self):
        v = parity_stats.equivalence(100.05, 0.02, 100.0, 0.02, df=10)
        assert v["verdict"] == "equivalent"
        assert abs(v["delta_pct"]) < 0.1
        assert v["ci_hi_pct"] <= 1.0 and v["ci_lo_pct"] >= -1.0

    def test_different_when_ci_outside_margin(self):
        v = parity_stats.equivalence(103.0, 0.1, 100.0, 0.1, df=10)
        assert v["verdict"] == "different"
        assert v["ci_lo_pct"] > 1.0

    def test_inconclusive_when_underpowered(self):
        """Small point delta but huge spread: the old point check would
        pass this; the rule must refuse to claim equivalence."""
        v = parity_stats.equivalence(100.2, 2.0, 100.0, 2.0, df=2)
        assert v["verdict"] == "inconclusive"
        assert v["mdd_pct"] > 1.0  # power statement: 1% not resolvable

    def test_symmetric_noise_prior_when_ref_se_missing(self):
        """No ref spread columns -> ref assumed as noisy as ours, which
        widens the CI vs treating the reference as exact."""
        v_sym = parity_stats.equivalence(100.0, 0.3, 100.0, None, df=10)
        v_exact = parity_stats.equivalence(100.0, 0.3, 100.0, 0.0, df=10)
        assert v_sym["mdd_pct"] > v_exact["mdd_pct"]
        assert v_sym["mdd_pct"] == pytest.approx(
            v_exact["mdd_pct"] * math.sqrt(2))

    def test_single_round_is_inconclusive(self):
        """df=0 (one round, one run) can never show equivalence."""
        v = parity_stats.equivalence(100.0, float("nan"), 100.0, df=0)
        assert v["verdict"] == "inconclusive"


class TestReportAndCLI:
    def _write_logs(self, tmp_path, ours_ade, spread=0.05):
        logs = tmp_path / "logs"
        logs.mkdir(parents=True)
        rounds = [(ours_ade - spread, 2 * ours_ade - spread),
                  (ours_ade, 2 * ours_ade),
                  (ours_ade + spread, 2 * ours_ade + spread)]
        (logs / "suite_a.out").write_text(_log([rounds]))
        return logs

    def _write_ref(self, tmp_path, ade, se=None):
        ref = tmp_path / "ref.csv"
        cols = "suite,ade,fde" + (",ade_se,fde_se" if se is not None
                                  else "")
        row = f"suite_a,{ade},{2 * ade}" + (f",{se},{se}"
                                            if se is not None else "")
        ref.write_text(cols + "\n" + row + "\n")
        return ref

    def test_report_csv_carries_ci_columns(self, tmp_path):
        logs = self._write_logs(tmp_path, 10.0)
        ref = self._write_ref(tmp_path, 10.0, se=0.01)
        rep, code = parity_stats.build_report(logs, ref)
        for col in ("ade_se", "fde_se", "ci_lo_pct", "ci_hi_pct",
                    "mdd_pct", "verdict"):
            assert col in rep.columns, col
        assert code == 0 and rep.verdict.iloc[0] == "equivalent"

    def test_exit_codes(self, tmp_path):
        logs = self._write_logs(tmp_path, 10.0)
        # demonstrably different: ref 5% away with tight spreads
        _, code = parity_stats.build_report(
            logs, self._write_ref(tmp_path, 9.5, se=0.01))
        assert code == 1
        # underpowered: huge spread in our rounds
        logs2 = self._write_logs(tmp_path / "b", 10.0, spread=1.5)
        _, code = parity_stats.build_report(
            logs2, self._write_ref(tmp_path / "b", 10.0, se=0.01))
        assert code == 2

    def test_cli_subprocess(self, tmp_path):
        """run_parity.sh's exact invocation works end-to-end."""
        logs = self._write_logs(tmp_path, 10.0)
        ref = self._write_ref(tmp_path, 10.0, se=0.01)
        res = subprocess.run(
            [sys.executable, "-m", "mst_tpu.evaluator.parity_stats",
             str(logs), str(ref), "--out",
             str(tmp_path / "parity_report.csv")],
            capture_output=True, text=True, timeout=120)
        assert res.returncode == 0, res.stderr
        assert "PARITY OK" in res.stdout
        assert (tmp_path / "parity_report.csv").exists()


class TestGateNeverPassesVacuously:
    """A gate that compared nothing must not print PARITY OK / exit 0."""

    def test_stale_rounds_dropped_on_new_run(self):
        # a killed run printed its rounds but no Average block; the next
        # run's spread must not inherit them
        partial = "Round 0: \nTest ADE: 99.0 \nTest FDE: 99.0\n" \
                  "Round 1: \nTest ADE: 98.0 \nTest FDE: 98.0\n"
        full = _log([[(10.0, 20.0), (11.0, 21.0)]])
        runs = extract_runs_with_rounds(partial + full)
        assert len(runs) == 1
        assert runs[0]["round_ade"] == [10.0, 11.0]

    def test_nonfinite_round_flows_to_inconclusive(self, tmp_path):
        logs = tmp_path / "logs"
        logs.mkdir()
        (logs / "suite_a.out").write_text(
            "Round 0: \nTest ADE: nan \nTest FDE: 20.0\n"
            "Round 1: \nTest ADE: 10.0 \nTest FDE: 21.0\n\n"
            "Average performance (by 2): \nTest ADE: 10.0 \n"
            "Test FDE: 20.5\n")
        ref = tmp_path / "ref.csv"
        ref.write_text("suite,ade,fde\nsuite_a,10.0,20.5\n")
        rep, code = parity_stats.build_report(logs, ref)
        assert code == 2  # nan spread can never demonstrate equivalence
        assert rep.verdict.iloc[0] == "inconclusive"

    def test_average_without_rounds_is_inconclusive(self, tmp_path):
        logs = tmp_path / "logs"
        logs.mkdir()
        (logs / "suite_a.out").write_text(
            "Average performance (by 3): \nTest ADE: 10.0 \n"
            "Test FDE: 20.0\n")
        ref = tmp_path / "ref.csv"
        ref.write_text("suite,ade,fde\nsuite_a,10.0,20.0\n")
        rep, code = parity_stats.build_report(logs, ref)
        assert code == 2
        assert rep.verdict.iloc[0] == "inconclusive"

    def test_no_matching_ref_rows_exit_2(self, tmp_path):
        logs = tmp_path / "logs"
        logs.mkdir()
        (logs / "suite_a.out").write_text(_log([[(10.0, 20.0),
                                                 (10.1, 20.1)]]))
        ref = tmp_path / "ref.csv"
        ref.write_text("suite,ade,fde\nWRONG_NAME,10.0,20.0\n")
        rep, code = parity_stats.build_report(logs, ref)
        assert code == 2
        assert rep.verdict.iloc[0] == "no_ref"

    def test_empty_log_dir_with_ref_exit_2(self, tmp_path):
        logs = tmp_path / "logs"
        logs.mkdir()
        ref = tmp_path / "ref.csv"
        ref.write_text("suite,ade,fde\nsuite_a,10.0,20.0\n")
        rep, code = parity_stats.build_report(logs, ref)
        assert code == 2

    def test_ci_columns_follow_the_driving_metric(self, tmp_path):
        # ADE tight + equivalent; FDE wide + inconclusive: the row's CI
        # must be FDE's (the verdict driver), not ADE's larger delta
        logs = tmp_path / "logs"
        logs.mkdir()
        rounds = [(10.0, 18.0), (10.01, 20.0), (9.99, 22.0)]
        (logs / "suite_a.out").write_text(_log([rounds]))
        ref = tmp_path / "ref.csv"
        ref.write_text("suite,ade,fde,ade_se,fde_se\n"
                       "suite_a,10.0,20.0,0.005,0.01\n")
        rep, code = parity_stats.build_report(logs, ref)
        assert rep.verdict.iloc[0] == "inconclusive"
        # FDE's CI half-width is far larger than ADE's
        half = (rep.ci_hi_pct.iloc[0] - rep.ci_lo_pct.iloc[0]) / 2
        assert half > 5.0, half  # ADE's would be ~0.1%
