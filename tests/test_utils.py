"""Store, project manager, report and viz tests."""

import os

import numpy as np
import pytest

from lidar_ai_recommendation_software_tpu.utils.project import (
    ProjectManager)
from lidar_ai_recommendation_software_tpu.utils.report import (
    generate_report, risk_level)
from lidar_ai_recommendation_software_tpu.utils.store import ResultsStore


class TestStore:
    def test_project_dataset_roundtrip(self, tmp_path):
        s = ResultsStore(str(tmp_path / "db.sqlite"))
        pid = s.create_project("p", "d")
        did = s.insert_dataset(pid, "cloud", np.random.rand(50, 3),
                               {"src": "test"})
        ds = s.get_dataset(did)
        assert ds["point_count"] == 50
        assert ds["points"].shape == (50, 3)
        assert ds["metadata"]["src"] == "test"
        assert s.list_datasets(pid)[0]["name"] == "cloud"
        s.close()

    def test_cascade_delete(self):
        s = ResultsStore()
        pid = s.create_project("p")
        s.insert_dataset(pid, "c", np.zeros((3, 3)))
        s.delete_project(pid)
        assert s.list_datasets(pid) == []

    def test_analysis_results_flow(self):
        s = ResultsStore()
        eid = s.create_event("concert", venue="arena")
        aid = s.create_analysis(event_id=eid, point_summary={"n": 10})
        s.save_density_results(aid, {"total_people": 3,
                                     "grid": np.eye(2)})
        s.save_flow_results(aid, {"avg_speed": 1.2})
        s.save_recommendations(aid, {"issues": []})
        s.save_report(aid, "<html></html>", title="t")
        assert s.get_density_results(aid)["total_people"] == 3
        assert s.get_flow_results(aid)["avg_speed"] == 1.2
        view = s.analyses_for_event(eid)
        assert view[0]["has_density"] and view[0]["has_flow"]
        assert s.list_reports()[0]["title"] == "t"

    def test_latest_result_wins(self):
        s = ResultsStore()
        aid = s.create_analysis()
        s.save_density_results(aid, {"v": 1})
        s.save_density_results(aid, {"v": 2})
        assert s.get_density_results(aid)["v"] == 2


class TestProjectManager:
    def test_project_file_roundtrip(self, tmp_path):
        pm = ProjectManager()
        pm.new_project("venue A", "test project")
        pts = np.random.RandomState(0).rand(100, 3)
        pm.add_dataset("scan1", pts, {"sensor": "VLP-16"})
        path = str(tmp_path / "proj")
        pm.save_project(path)
        assert os.path.exists(path + ".lcaz")

        pm2 = ProjectManager()
        proj = pm2.open_project(path + ".lcaz")
        assert proj.name == "venue A"
        assert len(pm2.datasets) == 1
        np.testing.assert_allclose(pm2.datasets[0].points, pts, atol=1e-6)
        assert pm2.datasets[0].metadata["sensor"] == "VLP-16"

    def test_rejects_non_project_zip(self, tmp_path):
        import zipfile
        p = str(tmp_path / "fake.lcaz")
        with zipfile.ZipFile(p, "w") as z:
            z.writestr("manifest.json", '{"format": "other"}')
        with pytest.raises(ValueError):
            ProjectManager().open_project(p)

    def test_run_analysis_and_export(self, tmp_path, fixture_points):
        pm = ProjectManager(db_path=str(tmp_path / "p.sqlite"))
        pm.new_project("venue")
        pm.add_dataset("fixture", fixture_points)
        out = pm.run_analysis()
        assert out["density"]["total_people"] == 446
        pm.export_results_json(str(tmp_path / "r.json"), "fixture")
        pm.export_results_csv(str(tmp_path / "r.csv"), "fixture")
        csv = open(tmp_path / "r.csv").read()
        assert "total_people,446" in csv
        assert "hotspot_1" in csv


class TestReport:
    def test_risk_bands(self):
        assert risk_level(0.5) == "Low"
        assert risk_level(1.5) == "Moderate"
        assert risk_level(3.0) == "High"
        assert risk_level(5.0) == "Critical"

    def test_report_html(self, fixture_points):
        from lidar_ai_recommendation_software_tpu.pipeline import Pipeline
        out = Pipeline().analyze(fixture_points)
        html = generate_report(out["density"], out["flow"],
                               out["recommendations"],
                               processed_summary={"points": 10000})
        assert html.startswith("<!DOCTYPE html>")
        assert "Executive Summary" in html
        assert "446" in html
        assert "data:image/png;base64," in html  # embedded figures
        assert "Critical crowd density" in html
        for step in out["recommendations"]["actions"][0]["steps"]:
            assert step[:20] in html

    def test_report_without_figures(self):
        html = generate_report(
            {"total_people": 0, "avg_density": 0.0, "max_density": 0.0,
             "hotspots": []},
            {"avg_speed": 0.0, "dominant_direction": "N/A",
             "bottlenecks": [],
             "flow_vectors": {"positions": np.zeros((0, 2)),
                              "vectors": np.zeros((0, 2)),
                              "magnitudes": np.zeros(0)}},
            {"issues": [], "actions": [], "opportunities": []},
            include_figures=False)
        assert "No density hotspots" in html
        assert "No significant bottlenecks" in html


class TestViz:
    def test_figures_render(self, fixture_points):
        from lidar_ai_recommendation_software_tpu.pipeline import Pipeline
        from lidar_ai_recommendation_software_tpu.utils import viz
        out = Pipeline().analyze(fixture_points)
        for fig in [
            viz.point_cloud_figure(fixture_points),
            viz.density_heatmap_figure(out["density"]),
            viz.flow_figure(out["flow"]),
            viz.congestion_figure(out["density"], out["flow"]),
        ]:
            b64 = viz.fig_to_base64(fig)
            assert len(b64) > 1000


class TestCLI:
    def test_sample_info_analyze(self, tmp_path, capsys):
        from lidar_ai_recommendation_software_tpu.cli import main
        venue = str(tmp_path / "v.npy")
        assert main(["sample", "--out", venue]) == 0
        assert main(["info", venue]) == 0
        report = str(tmp_path / "r.html")
        jout = str(tmp_path / "r.json")
        db = str(tmp_path / "cli.sqlite")
        assert main(["analyze", venue, "--report", report, "--json", jout,
                     "--store", db, "--no-figures"]) == 0
        captured = capsys.readouterr().out
        assert "people detected : 446" in captured
        assert os.path.exists(report) and os.path.exists(jout)
        s = ResultsStore(db)
        assert len(s.list_reports()) == 1
