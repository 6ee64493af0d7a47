from fastvideocodec_tpu.layers.blocks import (
    ChannelLayerNorm,
    ConvAttention,
    ConvLSTM,
    GEGLUFeedForward,
    MEBasic,
    ResBlock,
    ResnetBlock,
    SPnet,
    SpaceTimeAttention,
    TokenAttention,
    WarpNet,
    qrelu,
)
from fastvideocodec_tpu.layers.codecnet import CodecNet, er_gen_config
from fastvideocodec_tpu.layers.contextvp import ContextVP, VPCT
from fastvideocodec_tpu.layers.spynet import SpyNet, load_pretrained_spynet
from fastvideocodec_tpu.layers.transforms import (
    OUT_CHANNEL_M,
    OUT_CHANNEL_MV,
    OUT_CHANNEL_N,
    AnalysisMVNet,
    AnalysisNet,
    AnalysisPriorNet,
    FlowPredictor,
    SSFDecoder,
    SSFEncoder,
    SSFHyperDecoder,
    SSFHyperDecoderQReLU,
    SSFHyperEncoder,
    SynthesisMVNet,
    SynthesisNet,
    SynthesisPriorNet,
)
