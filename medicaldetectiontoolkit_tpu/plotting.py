"""Monitoring plots: batch predictions, training curves, histograms, ROC/PRC.

Rebuild of the reference's ``plotting.py`` with the same artifacts:
  * ``plot_batch_prediction`` — input/GT/prediction grids; 3D volumes are
    shown as slice strips around a sampled GT box (``plotting.py:26-158``);
  * ``TrainingPlot2Panel`` — per-epoch loss/metric curves
    (``plotting.py:162-224``);
  * prediction histograms and ROC/PRC curves (``plotting.py:227-272``).
"""

from __future__ import annotations

import os
from copy import deepcopy

import matplotlib

matplotlib.use("Agg")
import matplotlib.gridspec as gridspec  # noqa: E402
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def plot_batch_prediction(batch, results_dict, cf, outfile=None):
    """Grid plot: per batch element, rows = data channels / GT seg / pred seg /
    data-with-boxes. For 3D, one sampled patient is unrolled into slices
    around its first GT box."""
    if outfile is None:
        outfile = os.path.join(cf.plot_dir, f"pred_example_{cf.fold}.png")

    data = batch["data"]
    segs = batch["seg"]
    pids = batch["pid"]
    if len(set(map(str, np.atleast_1d(pids)))) == 1:
        pids = [pids] * data.shape[0]

    seg_preds = results_dict["seg_preds"]
    roi_results = deepcopy(results_dict["boxes"])

    if cf.dim == 3:
        patient_ix = np.random.choice(data.shape[0])
        data = np.transpose(data[patient_ix], axes=(3, 0, 1, 2))
        gt_boxes = [box["box_coords"] for box in roi_results[patient_ix] if box["box_type"] == "gt"]
        if len(gt_boxes) > 0:
            z_cuts = [np.max((int(gt_boxes[0][4]) - 5, 0)), np.min((int(gt_boxes[0][5]) + 5, data.shape[0]))]
        else:
            z_cuts = [data.shape[0] // 2 - 5, int(data.shape[0] // 2 + np.min([10, data.shape[0] // 2]))]
        p_roi_results = roi_results[patient_ix]
        roi_results = [[] for _ in range(data.shape[0])]
        for box in p_roi_results:
            b = box["box_coords"]
            slices = np.round(np.unique(np.clip(np.arange(b[4], b[5] + 1), 0, data.shape[0] - 1)))
            for s in slices:
                slice_box = dict(box)
                slice_box["box_coords"] = b[:4]
                roi_results[int(s)].append(slice_box)
        roi_results = roi_results[z_cuts[0] : z_cuts[1]]
        data = data[z_cuts[0] : z_cuts[1]]
        segs = np.transpose(segs[patient_ix], axes=(3, 0, 1, 2))[z_cuts[0] : z_cuts[1]]
        seg_preds = np.transpose(seg_preds[patient_ix], axes=(3, 0, 1, 2))[z_cuts[0] : z_cuts[1]]
        pids = [pids[patient_ix]] * data.shape[0]

    for i in [0, 2, 3]:
        assert data.shape[i] == segs.shape[i] == seg_preds.shape[i], (
            f"shapes of arrays to plot not in agreement: {data.shape} vs {segs.shape} vs {seg_preds.shape}"
        )

    show_arrays = np.concatenate([data, segs, seg_preds, data[:, 0][:, None]], axis=1).astype(float)
    approx_figshape = (4 * show_arrays.shape[0], 4 * show_arrays.shape[1])
    fig = plt.figure(figsize=approx_figshape)
    gs = gridspec.GridSpec(show_arrays.shape[1] + 1, show_arrays.shape[0])
    gs.update(wspace=0.1, hspace=0.1)
    for b in range(show_arrays.shape[0]):
        for m in range(show_arrays.shape[1]):
            ax = plt.subplot(gs[m, b])
            ax.axis("off")
            arr = show_arrays[b, m]
            if m < data.shape[1] or m == show_arrays.shape[1] - 1:
                cmap, vmin, vmax = "gray", None, None
            else:
                cmap, vmin, vmax = None, 0, cf.num_seg_classes - 1
            if m == 0:
                plt.title(f"{str(pids[b])[:10]}", fontsize=20)
            plt.imshow(arr, cmap=cmap, vmin=vmin, vmax=vmax)
            if m >= data.shape[1]:
                for box in roi_results[b]:
                    if box["box_type"] == "patient_tn_box":
                        continue
                    coords = box["box_coords"]
                    plot_text = False
                    if box["box_type"] == "det":
                        if not (box["box_pred_class_id"] > 0 and box["box_score"] > 0.1):
                            continue
                        # detections only on the dedicated overlay row
                        if m != data.shape[1] + 1:
                            continue
                        plot_text = True
                        score = np.max(box["box_score"])
                        score_text = f"{box['box_pred_class_id']}|{score * 100:.0f}"
                        score_font_size = 7
                        text_color = "w"
                        text_x = coords[1] + 10 * (box["box_pred_class_id"] - 1)
                        text_y = coords[2] + 5
                    elif box["box_type"] == "gt":
                        plot_text = True
                        score_text = int(box["box_label"])
                        score_font_size = 7
                        text_color = "r"
                        text_x = coords[1]
                        text_y = coords[0] - 1
                    color = cf.box_color_palette[box["box_type"]]
                    plt.plot([coords[1], coords[3]], [coords[0], coords[0]], color=color, linewidth=1)
                    plt.plot([coords[1], coords[3]], [coords[2], coords[2]], color=color, linewidth=1)
                    plt.plot([coords[1], coords[1]], [coords[0], coords[2]], color=color, linewidth=1)
                    plt.plot([coords[3], coords[3]], [coords[0], coords[2]], color=color, linewidth=1)
                    if plot_text:
                        plt.text(text_x, text_y, score_text, fontsize=score_font_size, color=text_color)

    plt.savefig(outfile)
    plt.close(fig)


class TrainingPlot2Panel:
    """Per-epoch loss/metric curve figure(s), saved after every epoch."""

    def __init__(self, cf):
        self.file_name = os.path.join(cf.plot_dir, f"monitor_{getattr(cf, 'fold', 0)}")
        self.exp_name = getattr(cf, "fold_dir", cf.plot_dir)
        self.do_validation = cf.do_validation
        self.separate_values_dict = cf.assign_values_to_extra_figure
        self.figure_list = []
        for _ in range(cf.n_monitoring_figures):
            fig = plt.figure(figsize=(10, 6))
            fig.ax1 = plt.subplot(111)
            fig.ax1.set_xlabel("epochs")
            fig.ax1.set_ylabel("loss / metrics")
            fig.ax1.set_xlim(0, cf.num_epochs)
            fig.ax1.grid()
            self.figure_list.append(fig)
        self.figure_list[0].ax1.set_ylim(0, 1.5)
        self.color_palette = ["b", "c", "r", "purple", "m", "y", "k", "tab:gray"]

    def update_and_save(self, metrics, epoch):
        for figure_ix, fig in enumerate(self.figure_list):
            detection_monitoring_plot(
                fig.ax1, metrics, self.exp_name, self.color_palette, epoch, figure_ix,
                self.separate_values_dict, self.do_validation,
            )
            fig.savefig(self.file_name + f"_{figure_ix}")


def detection_monitoring_plot(ax1, metrics, exp_name, color_palette, epoch, figure_ix, separate_values_dict, do_validation):
    monitor_values_keys = metrics["train"]["monitor_values"][1][0].keys()
    separate_values = [v for fig_ix in separate_values_dict.values() for v in fig_ix]
    if figure_ix == 0:
        plot_keys = [ii for ii in monitor_values_keys if ii not in separate_values]
        plot_keys += [k for k in metrics["train"].keys() if k != "monitor_values"]
    else:
        plot_keys = separate_values_dict[figure_ix]

    x = np.arange(1, epoch + 1)
    for kix, pk in enumerate(plot_keys):
        if pk in metrics["train"].keys():
            y_train = metrics["train"][pk][1:]
            y_val = metrics["val"][pk][1:] if do_validation else None
        else:
            y_train = [np.mean([er[pk] for er in metrics["train"]["monitor_values"][e]]) for e in x]
            y_val = (
                [np.mean([er[pk] for er in metrics["val"]["monitor_values"][e]]) if metrics["val"]["monitor_values"][e] else np.nan for e in x]
                if do_validation
                else None
            )
        color = color_palette[kix % len(color_palette)]
        ax1.plot(x, [np.nan if v is None else v for v in y_train], label=f"train_{pk}", linestyle="--", color=color)
        if do_validation:
            ax1.plot(x, [np.nan if v is None else v for v in y_val], label=f"val_{pk}", linestyle="-", color=color)

    if epoch == 1:
        box = ax1.get_position()
        ax1.set_position([box.x0, box.y0, box.width * 0.8, box.height])
        ax1.legend(loc="center left", bbox_to_anchor=(1, 0.5))
        ax1.set_title(exp_name)


def plot_prediction_hist(label_list, pred_list, type_list, outfile):
    """Histogram of prediction scores split by tp/fp (fn appear at score 0)."""
    preds = np.array(pred_list)
    labels = np.array(label_list)
    title = os.path.basename(outfile) + f" count:{len(label_list)}"
    plt.figure()
    plt.yscale("log")
    if 0 in labels:
        plt.hist(preds[labels == 0], alpha=0.3, color="g", range=(0, 1), bins=50, label="false pos.")
    if 1 in labels:
        plt.hist(preds[labels == 1], alpha=0.3, color="b", range=(0, 1), bins=50, label="true pos. (false neg. @ score=0)")
    if type_list is not None:
        fp_count = type_list.count("det_fp")
        fn_count = type_list.count("det_fn")
        tp_count = type_list.count("det_tp")
        title += f" tp:{tp_count} fp:{fp_count} fn:{fn_count} pos:{fn_count + tp_count}"
    plt.legend()
    plt.title(title)
    plt.xlabel("confidence score")
    plt.ylabel("log n")
    plt.savefig(outfile)
    plt.close()


def plot_stat_curves(stats, outfile):
    for c in ["roc", "prc"]:
        plt.figure()
        for s in stats:
            if s.get(c) is not None and not (isinstance(s[c], float) and np.isnan(s[c])):
                plt.plot(s[c][0], s[c][1], label=s["name"] + "_" + c)
        plt.title(os.path.basename(outfile) + "_" + c)
        plt.legend(loc=3 if c == "prc" else 4)
        plt.xlabel("precision" if c == "prc" else "1-spec.")
        plt.ylabel("recall")
        plt.savefig(outfile + "_" + c)
        plt.close()
