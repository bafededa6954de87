from .plotting import plot_alignment, plot_spectrogram
from .logging import MetricLogger
