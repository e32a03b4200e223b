from ap_adapter_tpu.audio.fbank import kaldi_fbank, audiomae_fbank
from ap_adapter_tpu.audio.mel import tacotron_mel, wav_to_vae_mel
from ap_adapter_tpu.audio.dsp import resample, frame_signal
from ap_adapter_tpu.audio.io import load_wav, save_wav

__all__ = [
    "kaldi_fbank",
    "audiomae_fbank",
    "tacotron_mel",
    "wav_to_vae_mel",
    "resample",
    "frame_signal",
    "load_wav",
    "save_wav",
]
