"""Streamlit front-end (optional).

The TPU counterpart of the reference's Streamlit wizard family (app.py,
app_simplified.py, app_with_db.py): one app, five tabs
(Upload -> Visualize -> Analyze -> Recommendations -> Report) plus a
Database tab when a store path is configured (app_with_db.py:1441-1508).
Gated on streamlit being installed; the analytics core is the same
Pipeline the CLI uses.

Run:  streamlit run lidar_ai_recommendation_software_tpu/app.py
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

try:
    import streamlit as st
    HAVE_STREAMLIT = True
except ImportError:  # pragma: no cover - exercised only without streamlit
    HAVE_STREAMLIT = False


def main():  # pragma: no cover - UI glue, manually driven
    if not HAVE_STREAMLIT:
        raise SystemExit(
            "streamlit is not installed; use the CLI front-end instead: "
            "python -m lidar_ai_recommendation_software_tpu.cli --help")

    from lidar_ai_recommendation_software_tpu.config import (
        MODULAR_CONFIG, MONOLITH_CONFIG)
    from lidar_ai_recommendation_software_tpu.pipeline import Pipeline
    from lidar_ai_recommendation_software_tpu.synthetic import sample_venue
    from lidar_ai_recommendation_software_tpu.utils import io as pio
    from lidar_ai_recommendation_software_tpu.utils import viz
    from lidar_ai_recommendation_software_tpu.utils.report import (
        generate_report)
    from lidar_ai_recommendation_software_tpu.utils.store import (
        ResultsStore)

    st.set_page_config(page_title="LiDAR Crowd Analytics (TPU)",
                       layout="wide")
    st.title("LiDAR Crowd Analytics — TPU engine")

    ss = st.session_state
    for key in ("points", "results"):
        ss.setdefault(key, None)

    tabs = st.tabs(["Upload", "Visualize", "Analyze",
                    "Recommendations", "Report", "Database"])

    with tabs[0]:
        st.header("Upload point cloud")
        use_sample = st.checkbox("Use generated sample data")
        up = st.file_uploader(
            "Point cloud file",
            type=["csv", "xyz", "txt", "npy", "pcd", "ply", "las"])
        if use_sample:
            ss.points = sample_venue()
            st.success(f"sample venue loaded: {len(ss.points):,} points")
        elif up is not None:
            fmt = up.name.rsplit(".", 1)[-1]
            ss.points = pio.load_points(up.read(), fmt=fmt)
            st.success(f"{up.name}: {len(ss.points):,} points")

    with tabs[1]:
        st.header("Visualize")
        if ss.points is None:
            st.info("upload a point cloud first")
        else:
            color_by = st.selectbox(
                "Color by", ["Height", "Density", "Distance", "Cluster"])
            st.pyplot(viz.point_cloud_figure(ss.points,
                                             color_by=color_by,
                                             preview=True))

    with tabs[2]:
        st.header("Analyze")
        variant = st.radio("Variant", ["monolith", "modular"],
                           horizontal=True)
        if ss.points is not None and st.button("Run analysis"):
            cfg = (MONOLITH_CONFIG if variant == "monolith"
                   else MODULAR_CONFIG)
            with st.spinner("Running TPU pipeline..."):
                ss.results = Pipeline(cfg).analyze(ss.points)
            st.success("done")
        if ss.results:
            d = ss.results["density"]
            f = ss.results["flow"]
            c1, c2, c3, c4 = st.columns(4)
            c1.metric("People", d["total_people"])
            c2.metric("Max density", f"{d['max_density']:.2f}")
            c3.metric("Avg speed", f"{f['avg_speed']:.2f} m/s")
            c4.metric("Direction", f["dominant_direction"])
            st.pyplot(viz.density_heatmap_figure(d))
            st.pyplot(viz.flow_figure(f))

    with tabs[3]:
        st.header("Recommendations")
        if not ss.results:
            st.info("run the analysis first")
        else:
            r = ss.results["recommendations"]
            for issue in r["issues"]:
                st.error(f"**{issue['title']}** (severity "
                         f"{issue['severity']}/10, {issue['location']}) — "
                         f"{issue['description']}")
            for action in r["actions"]:
                with st.expander(f"{action['title']} "
                                 f"({action['priority']} priority)"):
                    st.write(action["description"])
                    for s in action["steps"]:
                        st.write(f"- {s}")
            for op in r["opportunities"]:
                st.success(f"**{op['title']}** ({op['impact']} impact) — "
                           f"{op['description']}")

    with tabs[4]:
        st.header("Report")
        if ss.results and st.button("Generate report"):
            html = generate_report(
                ss.results["density"], ss.results["flow"],
                ss.results["recommendations"],
                processed_summary={"points": len(ss.points)})
            st.components.v1.html(html, height=800, scrolling=True)
            st.download_button("Download HTML", html,
                               file_name="crowd_report.html")

    with tabs[5]:
        st.header("Database")
        db_path = st.text_input("SQLite path", "crowd_analytics.sqlite")
        if ss.results and st.button("Save analysis to database"):
            store = ResultsStore(db_path)
            eid = store.create_event("streamlit session")
            aid = store.create_analysis(
                event_id=eid, point_summary={"n": len(ss.points)})
            d = ss.results["density"]
            f = ss.results["flow"]
            store.save_density_results(
                aid, {k: v for k, v in d.items()
                      if k not in ("density_map", "density_grid")})
            store.save_flow_results(
                aid, {k: v for k, v in f.items() if k != "flow_vectors"})
            store.save_recommendations(aid,
                                       ss.results["recommendations"])
            st.success(f"saved analysis {aid}")
        if os.path.exists(db_path):
            store = ResultsStore(db_path)
            st.subheader("Events")
            st.table(store.list_events())
            st.subheader("Reports")
            st.table(store.list_reports())


if __name__ == "__main__":
    main()
