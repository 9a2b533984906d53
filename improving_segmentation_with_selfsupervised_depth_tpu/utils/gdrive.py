"""Google Drive checkpoint downloader (reference
utils/google_drive_downloader.py + models/utils.py:108-172 registry).

Downloads the published SDE transfer checkpoints (torch .pth zips) which
`engine.torch_interop` then converts to Flax trees. Stdlib urllib only; in
zero-egress environments place the files manually under
MachineConfig.DOWNLOAD_MODEL_DIR/<name>/.
"""

from __future__ import annotations

import os
import urllib.parse
import urllib.request
import zipfile
from typing import Optional

# name -> gdrive file id (reference models/utils.py:112-134)
PRETRAINED_REGISTRY = {
    "mono_cityscapes_1024x512_r101dil_aspp_dec5":
        "1VF86Wqv9x7afLt_B8t2OaWtb-lG0vwyN",
    "mono_cityscapes_1024x512_r101dil_aspp_dec6_lr5_fd2":
        "1Kki3vwDxCeSdLQI5LLJVwk7erTk6EVkB",
    "mono_cityscapes_1024x512_r101dil_aspp_dec6_lr5":
        "19rJIafDLyAW348bYE3M_EoQcIK0OIj0V",
    "mono_cityscapes_1024x512_r101dil_aspp_dec5_posepretrain_crop512x512bs4":
        "1V3qzmCIfErOhLILnwCCchYMkaKLtUA7c",
    "mono_cityscapes_1024x512_r101dil_aspp_dec6_lr5_fd2_crop512x512bs4":
        "1woRzEPVuhaafrS_2_GlsJuVRyxWaGO4O",
    "mono_cityscapes_1024x512_r101dil_aspp_dec6_lr5_fd0_crop512x512bs4":
        "1G7bDZ-0PsHeMSHK59EqJn5ncqMzWB1Js",
    "mono_cityscapes_1024x512_r101dil_aspp_dec6_lr5_fd2_crop512x512bs2":
        "1bHlAYHKSv6sVbQBMlQ-D7kkUcAMb8-Jq",
}

_BASE_URL = "https://docs.google.com/uc?export=download"


def download_file_from_google_drive(file_id: str, dest_path: str,
                                    chunk_size: int = 32768) -> None:
    """Chunked download with the confirm-token dance for large files."""
    os.makedirs(os.path.dirname(dest_path), exist_ok=True)
    url = f"{_BASE_URL}&id={urllib.parse.quote(file_id)}"
    opener = urllib.request.build_opener(urllib.request.HTTPCookieProcessor())
    with opener.open(url) as resp:
        data = resp.read(chunk_size)
        # confirm-token redirect page?
        if b"confirm=" in data:
            token = data.split(b"confirm=")[1].split(b"&")[0].decode()
            url = f"{_BASE_URL}&confirm={token}&id={file_id}"
            with opener.open(url) as resp2, open(dest_path, "wb") as f:
                while True:
                    chunk = resp2.read(chunk_size)
                    if not chunk:
                        break
                    f.write(chunk)
            return
        with open(dest_path, "wb") as f:
            f.write(data)
            while True:
                chunk = resp.read(chunk_size)
                if not chunk:
                    break
                f.write(chunk)


def download_model_if_doesnt_exist(model_name: str,
                                   download_dir: Optional[str] = None) -> str:
    """Fetch + unzip a registry checkpoint (reference models/utils.py:108-172).
    Returns the model directory."""
    if download_dir is None:
        from ..config import MachineConfig

        download_dir = MachineConfig.DOWNLOAD_MODEL_DIR
        download_dir = os.path.expandvars(download_dir)
    os.makedirs(download_dir, exist_ok=True)
    model_path = os.path.join(download_dir, model_name)
    if os.path.exists(os.path.join(model_path, "depth.pth")) or \
            os.path.exists(os.path.join(model_path, "depth.msgpack")):
        return model_path
    file_id = PRETRAINED_REGISTRY[model_name]
    zip_path = model_path + ".zip"
    if not os.path.exists(zip_path):
        print(f"-> Downloading pretrained model to {zip_path}")
        download_file_from_google_drive(file_id, zip_path)
    print("   Unzipping model...")
    with zipfile.ZipFile(zip_path, "r") as f:
        f.extractall(model_path)
    return model_path
