"""In-process PyQt5 stub so the Qt widget layer (xmem2_tpu/interactive/gui.py,
gui_utils.py, interactive_demo.py) can be EXECUTED headlessly on machines with
no Qt. Same pattern as the torchvision stub in test_frame_selection.py.

The stub models the Qt semantics the GUI actually relies on: signal
connect/emit (pyqtSignal descriptors), slider/spinbox/combobox value-change
signals with blockSignals, synchronous QThreadPool, and widget trees enough
for layout bookkeeping. Rendering is a no-op. Install BEFORE importing any
xmem2_tpu.interactive.gui* module.
"""

import inspect
import sys
import types


# --------------------------------------------------------------------- core
class _BoundSignal:
    def __init__(self):
        self._slots = []

    def connect(self, fn):
        self._slots.append(fn)

    def disconnect(self, fn=None):
        if fn is None:
            self._slots = []
        else:
            self._slots.remove(fn)

    def emit(self, *args):
        for fn in list(self._slots):
            # Qt semantics: a slot may accept fewer arguments than the
            # signal carries — the extras are dropped
            try:
                params = inspect.signature(fn).parameters.values()
                if any(p.kind == p.VAR_POSITIONAL for p in params):
                    n = len(args)
                else:
                    n = min(len(args), sum(
                        1 for p in params
                        if p.kind in (p.POSITIONAL_ONLY,
                                      p.POSITIONAL_OR_KEYWORD)))
            except (TypeError, ValueError):
                n = len(args)
            fn(*args[:n])


class pyqtSignal:
    """Class-attribute descriptor yielding one bound signal per instance."""

    def __init__(self, *types_):
        self.types = types_

    def __set_name__(self, owner, name):
        self.name = name

    def __get__(self, obj, objtype=None):
        if obj is None:
            return self
        store = obj.__dict__.setdefault('_signals', {})
        if self.name not in store:
            store[self.name] = _BoundSignal()
        return store[self.name]


def pyqtSlot(*a, **k):
    def deco(fn):
        return fn
    return deco


class QObject:
    def __init__(self, parent=None):
        self.parent = parent

    def deleteLater(self):
        pass


class Qt:
    Horizontal = 1
    Vertical = 2
    Key_Left = 0x01000012
    Key_Right = 0x01000014
    LeftButton = 0x1
    RightButton = 0x2
    KeepAspectRatio = 1
    FastTransformation = 0


class QRunnable:
    def __init__(self):
        pass


class QThreadPool:
    """Synchronous: jobs run inline (deterministic for tests)."""

    def start(self, runnable):
        runnable.run()


class QTimer(QObject):
    instances = []
    timeout = pyqtSignal()

    def __init__(self, parent=None):
        super().__init__(parent)
        self.interval = None
        self.active = False
        QTimer.instances.append(self)

    def start(self, ms):
        self.interval = ms
        self.active = True

    def stop(self):
        self.active = False

    def isActive(self):
        return self.active

    def setSingleShot(self, b):
        self.single_shot = bool(b)

    def fire(self):
        self.timeout.emit()


class QKeySequence:
    def __init__(self, key):
        self.key = key


# ---------------------------------------------------------------------- gui
class QImage:
    Format_RGB888 = 13

    def __init__(self, data, w, h, stride, fmt):
        self.w, self.h = w, h

    def copy(self):
        return self


class QPixmap:
    def __init__(self, w=0, h=0):
        self.w, self.h = w, h

    @staticmethod
    def fromImage(img):
        return QPixmap(img.w, img.h)

    def width(self):
        return self.w

    def height(self):
        return self.h

    def scaled(self, size, *a, **k):
        return self


# ------------------------------------------------------------------ widgets
class _LayoutItem:
    def __init__(self, widget=None, layout=None):
        self._w, self._l = widget, layout

    def widget(self):
        return self._w


class _Layout:
    def __init__(self):
        self.items = []

    def addWidget(self, w, *stretch):
        self.items.append(_LayoutItem(widget=w))

    def addLayout(self, l, *stretch):
        self.items.append(_LayoutItem(layout=l))

    def count(self):
        return len(self.items)

    def takeAt(self, idx):
        return self.items.pop(idx)


class QHBoxLayout(_Layout):
    pass


class QVBoxLayout(_Layout):
    pass


class QWidget(QObject):
    def __init__(self, parent=None):
        super().__init__(parent)
        self._layout = None
        self._props = {}
        self._visible = False

    def setLayout(self, layout):
        self._layout = layout

    def layout(self):
        return self._layout

    def show(self):
        self._visible = True

    def setMouseTracking(self, b):
        pass

    def setToolTip(self, t):
        self._tooltip = t

    def setWindowTitle(self, t):
        self.window_title = t

    def setProperty(self, k, v):
        self._props[k] = v

    def property(self, k):
        return self._props.get(k)

    def setMaximumHeight(self, h):
        pass

    def setMinimumSize(self, w, h):
        self._min_size = (w, h)

    def size(self):
        class _Size:
            def width(self):
                return 100

            def height(self):
                return 100
        return _Size()

    def setMinimumWidth(self, w):
        pass


class QMainWindow(QWidget):
    def setCentralWidget(self, w):
        self.central = w


class QLabel(QWidget):
    def __init__(self, text='', parent=None):
        super().__init__(parent)
        self._text = text
        self._pixmap = None

    def setText(self, t):
        self._text = t

    def text(self):
        return self._text

    def setPixmap(self, p):
        self._pixmap = p

    def pixmap(self):
        return self._pixmap


class _ValueWidget(QWidget):
    valueChanged = pyqtSignal(int)

    def __init__(self, *a, **k):
        super().__init__()
        self._value = 0
        self._min, self._max = 0, 99
        self._blocked = False

    def blockSignals(self, b):
        self._blocked = bool(b)

    def setMinimum(self, v):
        self._min = v

    def setMaximum(self, v):
        self._max = v

    def setRange(self, lo, hi):
        self._min, self._max = lo, hi

    def setSingleStep(self, s):
        pass

    def setValue(self, v):
        v = max(self._min, min(self._max, v))
        changed = v != self._value
        self._value = v
        if changed and not self._blocked:
            self.valueChanged.emit(v)

    def value(self):
        return self._value


class QSlider(_ValueWidget):
    def __init__(self, orientation=Qt.Horizontal):
        super().__init__()


class QSpinBox(_ValueWidget):
    def __init__(self, parent=None):
        super().__init__()
        self._value = 1


class QComboBox(QWidget):
    currentTextChanged = pyqtSignal(str)

    def __init__(self, parent=None):
        super().__init__(parent)
        self.items = []
        self._current = ''

    def addItems(self, items):
        self.items.extend(items)
        if self.items and not self._current:
            self._current = self.items[0]

    def setCurrentText(self, t):
        changed = t != self._current
        self._current = t
        if changed:
            self.currentTextChanged.emit(t)

    def currentText(self):
        return self._current


class QPushButton(QWidget):
    clicked = pyqtSignal()

    def __init__(self, text='', parent=None):
        super().__init__(parent)
        self._text = text

    def click(self):
        self.clicked.emit()

    def setText(self, t):
        self._text = t

    def text(self):
        return self._text


class QRadioButton(QWidget):
    def __init__(self, text='', parent=None):
        super().__init__(parent)
        self._text = text
        self._checked = False

    def setChecked(self, b):
        self._checked = bool(b)

    def isChecked(self):
        return self._checked


class QCheckBox(QWidget):
    toggled = pyqtSignal(bool)

    def __init__(self, text='', parent=None):
        super().__init__(parent)
        self._text = text
        self._checked = False

    def setChecked(self, b):
        changed = bool(b) != self._checked
        self._checked = bool(b)
        if changed:
            self.toggled.emit(self._checked)

    def isChecked(self):
        return self._checked

    def setText(self, t):
        self._text = t


class QButtonGroup(QObject):
    def __init__(self, parent=None):
        super().__init__(parent)
        self.buttons = []

    def addButton(self, b):
        self.buttons.append(b)


class QPlainTextEdit(QWidget):
    def __init__(self, parent=None):
        super().__init__(parent)
        self.lines = []

    def appendPlainText(self, t):
        self.lines.append(t)

    def toPlainText(self):
        return '\n'.join(self.lines)

    def setReadOnly(self, b):
        pass


class QTabWidget(QWidget):
    def __init__(self, parent=None):
        super().__init__(parent)
        self.tabs = []

    def addTab(self, w, name):
        self.tabs.append((name, w))


class QScrollArea(QWidget):
    def setWidget(self, w):
        self._inner = w

    def setWidgetResizable(self, b):
        pass


class QProgressBar(QWidget):
    pass


class QShortcut(QObject):
    instances = []
    activated = pyqtSignal()

    def __init__(self, seq, parent=None):
        super().__init__(parent)
        self.seq = seq
        QShortcut.instances.append(self)


class QFileDialog:
    next_file = ''   # tests set this, then trigger the dialog-using action
    next_dir = ''

    @staticmethod
    def getOpenFileName(parent=None, caption='', directory='', filter=''):
        return QFileDialog.next_file, ''

    @staticmethod
    def getExistingDirectory(parent=None, caption='', directory=''):
        return QFileDialog.next_dir


class QApplication(QObject):
    def __init__(self, argv=None):
        super().__init__()

    @staticmethod
    def processEvents():
        pass

    def exec_(self):
        return 0


# --------------------------------------------------------------------- glue
class _Event:
    """Stand-in for QMouseEvent: pos().x()/.y(), button(), buttons()."""

    class _Pos:
        def __init__(self, x, y):
            self._x, self._y = x, y

        def x(self):
            return self._x

        def y(self):
            return self._y

    def __init__(self, x, y, button=Qt.LeftButton, buttons=None):
        self._pos = self._Pos(x, y)
        self._button = button
        self._buttons = buttons if buttons is not None else button

    def pos(self):
        return self._pos

    def button(self):
        return self._button

    def buttons(self):
        return self._buttons


def install():
    """Register the stub as PyQt5 in sys.modules (idempotent). Returns the
    stub package. No-op if a real PyQt5 is already importable."""
    if 'PyQt5' in sys.modules and not getattr(sys.modules['PyQt5'],
                                             '__xmem2_stub__', False):
        return sys.modules['PyQt5']   # real Qt already loaded — use it

    pkg = types.ModuleType('PyQt5')
    pkg.__xmem2_stub__ = True
    core = types.ModuleType('PyQt5.QtCore')
    gui = types.ModuleType('PyQt5.QtGui')
    widgets = types.ModuleType('PyQt5.QtWidgets')

    g = globals()
    for name in ('Qt', 'QObject', 'QRunnable', 'QThreadPool', 'QTimer',
                 'pyqtSignal', 'pyqtSlot'):
        setattr(core, name, g[name])
    for name in ('QImage', 'QPixmap', 'QKeySequence'):
        setattr(gui, name, g[name])
    for name in ('QApplication', 'QButtonGroup', 'QCheckBox', 'QComboBox',
                 'QFileDialog', 'QHBoxLayout', 'QLabel', 'QMainWindow',
                 'QPlainTextEdit', 'QPushButton', 'QRadioButton', 'QShortcut',
                 'QSlider', 'QSpinBox', 'QTabWidget', 'QVBoxLayout',
                 'QWidget', 'QScrollArea', 'QProgressBar'):
        setattr(widgets, name, g[name])

    pkg.QtCore, pkg.QtGui, pkg.QtWidgets = core, gui, widgets
    sys.modules['PyQt5'] = pkg
    sys.modules['PyQt5.QtCore'] = core
    sys.modules['PyQt5.QtGui'] = gui
    sys.modules['PyQt5.QtWidgets'] = widgets
    return pkg
