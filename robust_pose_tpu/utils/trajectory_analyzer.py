"""Trajectory plotting — rebuild of reference core/utils/trajectory_analyzer.py.

xyz-vs-time panels or a 3D trajectory plot over (N, 4, 4) pose arrays.
"""
from __future__ import annotations

import matplotlib

matplotlib.use("Agg") if not matplotlib.get_backend() else None
import matplotlib.pyplot as plt
import numpy as np


class TrajectoryAnalyzer:
    def __init__(self, plot_3d: bool = False, title: str = ""):
        if plot_3d:
            self.fig = plt.figure(figsize=(7, 7))
            self.ax = self.fig.add_subplot(projection="3d")
            self._3d = True
        else:
            self.fig, self.ax = plt.subplots(1, 3, figsize=(9, 2.5))
            self._3d = False
        if title:
            self.fig.suptitle(title)
        self.label = []

    def add_pose_trajectory(self, pose: np.ndarray, label: str = "",
                            color="b", linewidth=0.5, linestyle="solid"):
        """:param pose: (N, 4, 4) pose matrices"""
        self.label.append(label)
        if self._3d:
            self.ax.plot(pose[:, 0, 3], pose[:, 1, 3], pose[:, 2, 3],
                         linestyle=linestyle, color=color,
                         linewidth=linewidth, markersize=3, label=label)
            self.ax.set_xlabel("x (mm)")
            self.ax.set_ylabel("y (mm)")
            self.ax.set_zlabel("z (mm)")
        else:
            for i, axis_name in enumerate("xyz"):
                self.ax[i].plot(pose[:, i, 3], linestyle=linestyle,
                                color=color, linewidth=linewidth, label=label)
                self.ax[i].set_xlabel("t (frame)")
                self.ax[i].set_ylabel(f"{axis_name} (mm)")
                self.ax[i].grid(linestyle="dashed", linewidth=0.1)

    def write_file(self, path: str):
        plt.tight_layout()
        self.fig.savefig(path, bbox_inches="tight")

    def show(self):
        self.fig.canvas.draw()
        plt.tight_layout()
        plt.show()

    def legend(self):
        if self._3d:
            plt.legend()
        else:
            self.ax[2].legend()
