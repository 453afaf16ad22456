"""Interactive annotation GUI (PyQt5).

Behavioral parity target: reference inference/interact/gui.py (App :50):
timeline slider, brush/scribble/click interactions, forward/backward/FULL
propagation, permanent-memory reference management, annotation-candidate
computation, live memory-parameter controls, overlay visualization modes,
mask/layer import, memory gauges.

This is a compact reimplementation of the same surfaces on top of the
xmem2_tpu engine; it only imports when PyQt5 is installed (the engine and the
Python API never require Qt).
"""

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from PyQt5.QtCore import Qt, QTimer, QThreadPool
from PyQt5.QtGui import QImage, QPixmap, QKeySequence
from PyQt5.QtWidgets import (
    QApplication, QButtonGroup, QComboBox, QFileDialog, QHBoxLayout, QLabel,
    QMainWindow, QMessageBox, QPlainTextEdit, QProgressBar, QPushButton,
    QRadioButton, QShortcut, QSlider, QSpinBox, QTabWidget, QVBoxLayout,
    QWidget)

from xmem2_tpu.interactive.gui_utils import (
    ImageLinkCollection, NamedSlider, Worker)
from xmem2_tpu.interactive.interaction import (
    ClickInteraction, FreeInteraction, ScribbleInteraction)
from xmem2_tpu.interactive.interactive_utils import (
    get_visualization, image_to_jax, index_numpy_to_one_hot,
    prob_to_numpy_mask)
from xmem2_tpu.inference.frame_selection.frame_selection import (
    select_next_candidates)


def _np_to_pixmap(arr: np.ndarray) -> QPixmap:
    h, w, _ = arr.shape
    img = QImage(np.ascontiguousarray(arr).data, w, h, 3 * w,
                 QImage.Format_RGB888)
    return QPixmap.fromImage(img.copy())


class App(QMainWindow):
    def __init__(self, processor, resource_manager, s2m_ctrl, fbrs_ctrl,
                 config):
        super().__init__()
        self.processor = processor
        self.res_man = resource_manager
        self.s2m_controller = s2m_ctrl
        self.fbrs_controller = fbrs_ctrl
        self.config = config

        self.num_objects = resource_manager.num_objects
        self.processor.set_all_labels(list(range(1, self.num_objects + 1)))
        self.num_frames = len(resource_manager)
        self.height, self.width = resource_manager.h, resource_manager.w

        self.cursur = 0
        self.current_object = 1
        self.viz_mode = 'davis'
        self.interaction = None
        self.propagating = False
        self.brush_size = 3
        self.layer = None

        self.threadpool = QThreadPool()
        self._build_ui()
        self._restore_saved_masks()
        self._replay_references()
        self.show_current_frame()

    # ------------------------------------------------------------------ UI
    def _build_ui(self):
        self.setWindowTitle('xmem2_tpu interactive segmentation')
        central = QWidget()
        self.setCentralWidget(central)

        self.canvas = QLabel()
        self.canvas.setMouseTracking(True)
        self.canvas.mousePressEvent = self.on_mouse_press
        self.canvas.mouseMoveEvent = self.on_mouse_move
        self.canvas.mouseReleaseEvent = self.on_mouse_release

        self.tl_slider = QSlider(Qt.Horizontal)
        self.tl_slider.setMaximum(self.num_frames - 1)
        self.tl_slider.valueChanged.connect(self.on_slider)

        # interaction mode
        self.mode_group = QButtonGroup()
        mode_row = QHBoxLayout()
        self.radio_free = QRadioButton('Brush')
        self.radio_scribble = QRadioButton('Scribble (S2M)')
        self.radio_click = QRadioButton('Click (fBRS)')
        self.radio_free.setChecked(True)
        for b in (self.radio_free, self.radio_scribble, self.radio_click):
            self.mode_group.addButton(b)
            mode_row.addWidget(b)

        # object selector
        self.object_spin = QSpinBox()
        self.object_spin.setRange(1, self.num_objects)
        self.object_spin.valueChanged.connect(self.on_object_changed)
        mode_row.addWidget(QLabel('Object:'))
        mode_row.addWidget(self.object_spin)

        # viz mode
        self.viz_combo = QComboBox()
        self.viz_combo.addItems(['davis', 'fade', 'light', 'popup', 'layered'])
        self.viz_combo.currentTextChanged.connect(self.on_viz_mode)
        mode_row.addWidget(QLabel('Overlay:'))
        mode_row.addWidget(self.viz_combo)

        # propagation buttons
        prop_row = QHBoxLayout()
        self.btn_prop_fwd = QPushButton('Propagate →')
        self.btn_prop_bwd = QPushButton('← Propagate')
        self.btn_prop_full = QPushButton('FULL Propagate')
        self.btn_stop = QPushButton('Stop')
        self.btn_clear_mem = QPushButton('Clear memory')
        self.btn_prop_fwd.clicked.connect(lambda: self.on_propagation('forward'))
        self.btn_prop_bwd.clicked.connect(lambda: self.on_propagation('backward'))
        self.btn_prop_full.clicked.connect(self.on_full_propagation)
        self.btn_stop.clicked.connect(self.on_stop_propagation)
        self.btn_clear_mem.clicked.connect(self.on_clear_memory)
        for b in (self.btn_prop_bwd, self.btn_prop_full, self.btn_prop_fwd,
                  self.btn_stop, self.btn_clear_mem):
            prop_row.addWidget(b)

        # reference / candidate actions
        ref_row = QHBoxLayout()
        self.btn_save_ref = QPushButton('Save reference')
        self.btn_remove_ref = QPushButton('Remove reference')
        self.btn_candidates = QPushButton('Compute annotation candidates')
        self.btn_import_mask = QPushButton('Import mask')
        self.btn_import_layer = QPushButton('Import layer')
        self.btn_save_ref.clicked.connect(self.on_save_reference)
        self.btn_remove_ref.clicked.connect(self.on_remove_reference)
        self.btn_candidates.clicked.connect(self.on_compute_candidates)
        self.btn_import_mask.clicked.connect(self.on_import_mask)
        self.btn_import_layer.clicked.connect(self.on_import_layer)
        for b in (self.btn_save_ref, self.btn_remove_ref, self.btn_candidates,
                  self.btn_import_mask, self.btn_import_layer):
            ref_row.addWidget(b)

        # live memory parameters (reference gui.py:1090-1128)
        self.mem_sliders = {
            'mem_every': NamedSlider('mem every', 1, 100, 1,
                                     self.config['mem_every']),
            'top_k': NamedSlider('top k', 5, 100, 1, self.config['top_k']),
            'max_mid_term_frames': NamedSlider(
                'max mid-term', 4, 100, 1, self.config['max_mid_term_frames']),
            'min_mid_term_frames': NamedSlider(
                'min mid-term', 3, 99, 1, self.config['min_mid_term_frames']),
            'num_prototypes': NamedSlider(
                'prototypes', 32, 1280, 32, self.config['num_prototypes']),
            'max_long_term_elements': NamedSlider(
                'max long-term', 1000, 100000, 1000,
                self.config['max_long_term_elements']),
        }
        mem_col = QVBoxLayout()
        for s in self.mem_sliders.values():
            s.valueChanged.connect(self.update_config)
            mem_col.addWidget(s)

        # gauges (reference gui.py:1073-1088)
        self.mem_gauge = QLabel('memory: -')
        self.gpu_gauge = QLabel('device: -')
        gauge_timer = QTimer(self)
        gauge_timer.timeout.connect(self.update_memory_size)
        gauge_timer.start(2000)

        self.console = QPlainTextEdit()
        self.console.setReadOnly(True)
        self.console.setMaximumHeight(100)

        self.references_tab = ImageLinkCollection(
            self.jump_to_frame, self._thumbnail, name='References')
        self.candidates_tab = ImageLinkCollection(
            self.jump_to_frame, self._thumbnail, name='Candidates')
        tabs = QTabWidget()
        tabs.addTab(self.references_tab, 'References')
        tabs.addTab(self.candidates_tab, 'Candidates')

        left = QVBoxLayout()
        left.addWidget(self.canvas)
        left.addWidget(self.tl_slider)
        left.addLayout(mode_row)
        left.addLayout(prop_row)
        left.addLayout(ref_row)
        left.addWidget(self.console)

        right = QVBoxLayout()
        right.addLayout(mem_col)
        right.addWidget(self.mem_gauge)
        right.addWidget(self.gpu_gauge)
        right.addWidget(tabs)

        root = QHBoxLayout()
        root.addLayout(left, 4)
        root.addLayout(right, 1)
        central.setLayout(root)

        QShortcut(QKeySequence(Qt.Key_Left), self).activated.connect(
            lambda: self.tl_slider.setValue(max(0, self.cursur - 1)))
        QShortcut(QKeySequence(Qt.Key_Right), self).activated.connect(
            lambda: self.tl_slider.setValue(
                min(self.num_frames - 1, self.cursur + 1)))

    def text(self, msg):
        self.console.appendPlainText(str(msg))

    # ------------------------------------------------------------- frames
    def _thumbnail(self, frame_id):
        img = self.res_man.get_image(frame_id)
        small = img[::4, ::4]
        return _np_to_pixmap(np.ascontiguousarray(small))

    def _restore_saved_masks(self):
        pass  # masks are read lazily through the resource manager

    def _replay_references(self):
        """Re-insert saved references into permanent memory on startup
        (reference gui.py:599-603)."""
        for fi in sorted(self.res_man.references):
            mask = self.res_man.get_mask(fi)
            if mask is None:
                continue
            self._put_reference(fi, mask)
            self.references_tab.add_image(fi)

    def _current_image_jax(self):
        norm, _ = image_to_jax(self.res_man.get_image(self.cursur))
        return norm

    def current_mask(self):
        m = self.res_man.get_mask(self.cursur)
        if m is None:
            return np.zeros((self.height, self.width), np.uint8)
        return m.copy()

    def show_current_frame(self):
        image = self.res_man.get_image(self.cursur)
        mask = self.current_mask()
        viz = get_visualization(self.viz_mode, image, mask, self.layer,
                                self.current_object)
        self.canvas.setPixmap(_np_to_pixmap(viz))
        self.res_man.save_visualization(self.cursur, viz)

    def jump_to_frame(self, fi):
        self.tl_slider.setValue(fi)

    # ------------------------------------------------------------- events
    def on_slider(self, value):
        self.cursur = value
        self.interaction = None
        if self.fbrs_controller is not None:
            self.fbrs_controller.unanchor()
        self.show_current_frame()

    def on_viz_mode(self, mode):
        self.viz_mode = mode
        self.show_current_frame()

    def on_object_changed(self, value):
        self.current_object = value

    def _canvas_coords(self, event):
        pix = self.canvas.pixmap()
        if pix is None:
            return None
        x = event.pos().x() * self.width / max(pix.width(), 1)
        y = event.pos().y() * self.height / max(pix.height(), 1)
        return float(np.clip(x, 0, self.width - 1)), \
            float(np.clip(y, 0, self.height - 1))

    def on_mouse_press(self, event):
        coords = self._canvas_coords(event)
        if coords is None:
            return
        x, y = coords
        is_neg = event.button() == Qt.RightButton

        if self.radio_click.isChecked():
            if not isinstance(self.interaction, ClickInteraction):
                prev = index_numpy_to_one_hot(self.current_mask(),
                                              self.num_objects + 1)
                self.interaction = ClickInteraction(
                    self._current_image_jax(), prev,
                    (self.height, self.width), self.fbrs_controller,
                    self.current_object)
            self.interaction.push_point(x, y, is_neg)
            self._commit_interaction()
        elif self.radio_scribble.isChecked():
            if not isinstance(self.interaction, ScribbleInteraction):
                self.interaction = ScribbleInteraction(
                    self._current_image_jax(), self.current_mask(),
                    (self.height, self.width), self.s2m_controller,
                    self.num_objects)
            self.interaction.push_point(
                x, y, 0 if is_neg else self.current_object)
        else:
            if not isinstance(self.interaction, FreeInteraction):
                self.interaction = FreeInteraction(
                    None, self.current_mask(), (self.height, self.width),
                    self.num_objects)
                self.interaction.set_size(self.brush_size)
            self.interaction.push_point(
                x, y, 0 if is_neg else self.current_object)

    def on_mouse_move(self, event):
        if self.interaction is None or self.radio_click.isChecked():
            return
        if not (event.buttons() & (Qt.LeftButton | Qt.RightButton)):
            return
        coords = self._canvas_coords(event)
        if coords is None:
            return
        is_neg = bool(event.buttons() & Qt.RightButton)
        self.interaction.push_point(
            coords[0], coords[1], 0 if is_neg else self.current_object)

    def on_mouse_release(self, event):
        if self.interaction is None or self.radio_click.isChecked():
            return
        self.interaction.end_path()
        self._commit_interaction()

    def _commit_interaction(self):
        prob = self.interaction.predict()
        mask = prob_to_numpy_mask(np.asarray(prob)) \
            if prob.shape[0] == self.num_objects + 1 \
            else prob_to_numpy_mask(np.asarray(prob))
        self.res_man.save_mask(self.cursur, mask)
        self.show_current_frame()

    # -------------------------------------------------------- propagation
    def on_propagation(self, direction):
        """Forward/backward propagation loop (reference gui.py:751-816)."""
        mask = self.res_man.get_mask(self.cursur)
        if mask is None or mask.max() == 0:
            self.text('No mask on the current frame to propagate from.')
            return
        self.propagating = True

        onehot = index_numpy_to_one_hot(mask, self.num_objects + 1)[1:]
        image = self._current_image_jax()
        self.processor.clear_memory(keep_permanent=True)
        prob = self.processor.step(image, jnp.asarray(onehot),
                                   list(range(1, self.num_objects + 1)))
        self._store_step(self.cursur, prob, image)

        rng = (range(self.cursur + 1, self.num_frames)
               if direction == 'forward'
               else range(self.cursur - 1, -1, -1))
        for ti in rng:
            if not self.propagating:
                break
            self.cursur = ti
            norm, _ = image_to_jax(self.res_man.get_image(ti))
            prob, key, shrinkage, selection = self.processor.step(
                norm, return_key_and_stuff=True)
            self._store_step(ti, prob, norm, key, shrinkage, selection)
            self.tl_slider.blockSignals(True)
            self.tl_slider.setValue(ti)
            self.tl_slider.blockSignals(False)
            self.show_current_frame()
            QApplication.processEvents()
        self.propagating = False

    def _store_step(self, ti, prob, image, key=None, shrinkage=None,
                    selection=None):
        mask = prob_to_numpy_mask(prob)
        self.res_man.save_mask(ti, mask)
        if key is None:
            key, shrinkage, selection = self.processor.encode_frame_key(image)
        small = np.asarray(prob)[1:, ::16, ::16]
        self.res_man.add_key_and_stuff_with_mask(ti, key, shrinkage,
                                                 selection, small)

    def on_full_propagation(self):
        """FULL: clear to permanent only, jump to frame 0, propagate forward
        (reference gui.py:714-750)."""
        self.on_clear_memory()
        ref_frames = sorted(self.res_man.references)
        start = ref_frames[0] if ref_frames else 0
        self.tl_slider.setValue(start)
        self.cursur = start
        self.on_propagation('forward')

    def on_stop_propagation(self):
        self.propagating = False

    def on_clear_memory(self):
        self.processor.clear_memory(keep_permanent=True)
        self.text('Working/long-term memory cleared (permanent kept).')
        self.update_memory_size()

    # --------------------------------------------------------- references
    def on_save_reference(self):
        mask = self.res_man.get_mask(self.cursur)
        if mask is None or mask.max() == 0:
            self.text('No mask to save as reference.')
            return
        self._put_reference(self.cursur, mask)
        self.res_man.add_reference(self.cursur)
        self.references_tab.add_image(self.cursur)
        self.text(f'Frame {self.cursur} saved to permanent memory.')

    def _put_reference(self, fi, mask):
        norm, _ = image_to_jax(self.res_man.get_image(fi))
        onehot = index_numpy_to_one_hot(mask, self.num_objects + 1)[1:]
        self.processor.put_to_permanent_memory(norm, jnp.asarray(onehot),
                                               ti=fi)

    def on_remove_reference(self):
        if self.cursur not in self.res_man.references:
            self.text('Current frame is not a reference.')
            return
        self.processor.remove_from_permanent_memory(self.cursur)
        self.res_man.remove_reference(self.cursur)
        self.references_tab.remove_image(self.cursur)
        self.text(f'Frame {self.cursur} removed from permanent memory.')

    # --------------------------------------------------------- candidates
    def on_compute_candidates(self):
        """Run the diversity selector off the UI thread
        (reference gui.py:818-850)."""
        if not self.res_man.all_masks_present():
            self.text('Some frames lack cached keys/masks — run FULL '
                      'propagation first.')
            return
        k = 5

        def compute():
            return select_next_candidates(
                self.res_man.keys, self.res_man.shrinkages,
                self.res_man.selections,
                list(self.res_man.small_masks), k,
                previously_chosen_candidates=sorted(self.res_man.references)
                or [0],
                alpha=0.5, only_new_candidates=True)

        worker = Worker(compute)
        worker.signals.result.connect(self._show_candidates)
        worker.signals.error.connect(lambda e: self.text(e[2]))
        self.threadpool.start(worker)
        self.text('Computing annotation candidates...')

    def _show_candidates(self, candidates):
        self.candidates_tab.clear()
        for fi in candidates:
            self.candidates_tab.add_image(int(fi))
        self.text(f'Next annotation candidates: {candidates}')

    # ------------------------------------------------------------- import
    def on_import_mask(self):
        file_name, _ = QFileDialog.getOpenFileName(self, 'Select mask file')
        if not file_name:
            return
        mask = self.res_man.read_external_image(
            file_name, size=(self.height, self.width), force_mask=True)
        self.res_man.save_mask(self.cursur, mask)
        self.show_current_frame()

    def on_import_layer(self):
        file_name, _ = QFileDialog.getOpenFileName(self, 'Select RGBA layer')
        if not file_name:
            return
        layer = self.res_man.read_external_image(
            file_name, size=(self.height, self.width))
        if layer.ndim == 3 and layer.shape[-1] == 4:
            self.layer = layer
            self.viz_combo.setCurrentText('layered')
        else:
            self.text('Layer must be RGBA.')

    # -------------------------------------------------------------- misc
    def update_config(self):
        cfg = dict(self.config)
        for key, slider in self.mem_sliders.items():
            cfg[key] = int(slider.value())
        self.config = cfg
        self.processor.update_config(cfg)

    def update_memory_size(self):
        mm = self.processor.memory
        self.mem_gauge.setText(
            f'memory: temp {mm.temp_size} | perm {mm.perm_size} | '
            f'long {mm.long_size}')
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            used = stats.get('bytes_in_use', 0) / 2**20
            self.gpu_gauge.setText(f'device: {used:.0f} MB')
        except Exception:
            self.gpu_gauge.setText('device: n/a')
