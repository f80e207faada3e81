"""Desktop mesh/NeRF viewers (dearpygui, optional).

Rebuilds the role of the reference's dearpygui GUIs
(`lib/core/ssdnerf_gui.py:102` orbit-camera NeRF viewer with sampling
controls, `lib/core/mesh_gui.py:78` mesh viewer). dearpygui is optional in
this environment; when absent, `OrbitViewer.render_turntable` still
produces the orbit frames/video headlessly (the same render path the GUIs
drive interactively).
"""
import numpy as np

__all__ = ["OrbitViewer"]


class OrbitViewer:
    """Headless-capable orbit viewer around a render callback.

    render_fn(pose (3,4), intrinsics (4,)) -> (H, W, 3) float [0,1].
    """

    def __init__(self, render_fn, intrinsics, distance=2.5, elev=0.2):
        self.render_fn = render_fn
        self.intrinsics = np.asarray(intrinsics, np.float32)
        self.distance = distance
        self.elev = elev

    def frame(self, azimuth, elev=None, distance=None):
        from ..utils.camera import get_pose_from_angles
        pose = get_pose_from_angles(
            np.asarray([azimuth], np.float32),
            np.asarray([elev if elev is not None else self.elev],
                       np.float32),
            distance or self.distance)[0, :3]
        return np.asarray(self.render_fn(pose, self.intrinsics))

    def render_turntable(self, num_frames=60, path=None, fps=30):
        from ..utils.video import write_video
        frames = [self.frame(a) for a in
                  np.linspace(0, 2 * np.pi, num_frames, endpoint=False)]
        if path:
            return write_video(np.stack(frames), path, fps)
        return np.stack(frames)

    def run_gui(self, width=800, height=800):
        """Interactive dearpygui window (requires dearpygui)."""
        try:
            import dearpygui.dearpygui as dpg
        except ImportError as e:
            raise ImportError(
                "dearpygui not installed; use render_turntable() for "
                "headless orbit rendering") from e
        dpg.create_context()
        state = {"azi": 0.0, "elev": self.elev, "dist": self.distance}

        def redraw():
            img = self.frame(state["azi"], state["elev"], state["dist"])
            dpg.set_value("tex", np.asarray(
                np.concatenate([img, np.ones_like(img[..., :1])], -1),
                np.float32).ravel())

        h, w = self.frame(0.0).shape[:2]
        with dpg.texture_registry():
            dpg.add_raw_texture(w, h, np.zeros((h * w * 4,), np.float32),
                                tag="tex", format=dpg.mvFormat_Float_rgba)
        with dpg.window(label="mvedit_tpu viewer"):
            dpg.add_image("tex")
            for key, lo, hi in (("azi", 0.0, 6.283), ("elev", -1.2, 1.2),
                                ("dist", 1.2, 5.0)):
                dpg.add_slider_float(
                    label=key, default_value=state[key], min_value=lo,
                    max_value=hi,
                    callback=lambda s, v, k=key: (state.__setitem__(k, v),
                                                  redraw()))
        redraw()
        dpg.create_viewport(title="mvedit_tpu", width=width, height=height)
        dpg.setup_dearpygui()
        dpg.show_viewport()
        dpg.start_dearpygui()
        dpg.destroy_context()
