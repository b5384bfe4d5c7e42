# runtime shape checks over the signal codec (parity with the reference's
# jaxtyping+beartype hook, reference __main__.py:2-7); must install before
# the checked modules are imported. Disable with OSU_DREAMER_TYPECHECK=0.
from osu_dreamer_tpu.utils.typecheck import install_typecheck

install_typecheck()

from osu_dreamer_tpu.cli import main  # noqa: E402

if __name__ == "__main__":
    main()
