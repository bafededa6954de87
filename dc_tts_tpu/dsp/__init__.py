from .mel import mel_filterbank
from .stft import stft, istft, hann_window, frame_indices
from .griffin_lim import griffin_lim, spectrogram_to_wav
from .features import wav_to_spectrograms, reduce_mel, preemphasis, deemphasis
