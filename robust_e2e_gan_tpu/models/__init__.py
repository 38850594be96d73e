from robust_e2e_gan_tpu.models import rnn  # noqa: F401
from robust_e2e_gan_tpu.models import encoder  # noqa: F401
from robust_e2e_gan_tpu.models import attention  # noqa: F401
from robust_e2e_gan_tpu.models import decoder  # noqa: F401
from robust_e2e_gan_tpu.models import e2e  # noqa: F401
from robust_e2e_gan_tpu.models import enhancement  # noqa: F401
