from .adaattn import AdaAttN, AdaIN, adaattn_statistics
from .ast import AST
from .autoencoder import AutoEncoder
from .decoder import Decoder, DecoderBlock
from .encoder import Encoder
from .mobilenetv2 import Discriminator, MobileNetV2
from .vgg import VGG19Features, load_torch_vgg19_state_dict
