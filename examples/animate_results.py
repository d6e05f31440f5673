"""GIF writer for DMBD assignment movies
(reference examples/animate_results.py:6-47).

Renders each (time, batch) frame of a trajectory as a scatter of the
observation positions, colored by the model's role / sbz / particular
assignment and alpha-weighted by assignment confidence, and saves a GIF
via PillowWriter.
"""
import numpy as np
from matplotlib import cm
from matplotlib import pyplot as plt
from matplotlib.animation import FuncAnimation, PillowWriter


class animate_results:
    def __init__(
        self,
        assignment_type="sbz",
        f=r"./movie_temp.gif",
        xlim=(-2.5, 2.5),
        ylim=(-2.5, 2.5),
        fps=20,
    ):
        self.assignment_type = assignment_type
        self.f = f
        self.xlim = xlim
        self.ylim = ylim
        self.fps = fps

    def animation_function(self, frame_number, fig_data, fig_assignments, fig_confidence):
        fn = frame_number
        T = fig_data.shape[0]
        self.scatter.set_offsets(fig_data[fn % T, fn // T, :, :])
        self.scatter.set_array(fig_assignments[fn % T, fn // T, :])
        self.scatter.set_alpha(fig_confidence[fn % T, fn // T, :])
        return (self.scatter,)

    def make_movie(self, model, data, batch_numbers, show=False):
        """model: a fitted DynamicMarkovBlanketDiscovery; data: (T,B,N,d>=2)."""
        print("Generating animation using", self.assignment_type, "assignments")

        if self.assignment_type == "role":
            rn = model.role_dims[0] + model.number_of_objects * (
                model.role_dims[1] + model.role_dims[2]
            )
            assignments = np.asarray(model.obs_model.assignment()) / max(rn - 1, 1)
            confidence = np.asarray(model.obs_model.assignment_pr()).max(-1)
        elif self.assignment_type == "sbz":
            assignments = (
                np.asarray(model.assignment()) / 2.0 / model.number_of_objects
            )
            confidence = np.asarray(model.assignment_pr()).max(-1)
        elif self.assignment_type == "particular":
            assignments = (
                np.asarray(model.particular_assignment()) / model.number_of_objects
            )
            confidence = np.asarray(model.assignment_pr()).max(-1)
        else:
            raise ValueError(f"unknown assignment_type {self.assignment_type!r}")

        data = np.asarray(data)
        fig_data = data[:, batch_numbers, :, 0:2]
        fig_assignments = assignments[:, batch_numbers, :]
        fig_confidence = np.minimum(confidence[:, batch_numbers, :], 1.0)

        self.fig = plt.figure(figsize=(7, 7))
        self.ax = plt.axes(xlim=self.xlim, ylim=self.ylim)
        self.scatter = self.ax.scatter(
            [], [], cmap=cm.rainbow_r, c=[], vmin=0.0, vmax=1.0
        )
        FuncAnimation(
            self.fig,
            self.animation_function,
            frames=range(fig_data.shape[0] * fig_data.shape[1]),
            fargs=(fig_data, fig_assignments, fig_confidence),
            interval=5,
        ).save(self.f, writer=PillowWriter(fps=self.fps))
        if show:
            plt.show()
        plt.close(self.fig)
        return self.f
