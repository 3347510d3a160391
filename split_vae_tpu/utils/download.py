"""Google Drive file downloader (reference parity: vae/utils.py:11-37).

Used for the CelebA zip in the reference. Kept behind a lazy requests import
so offline/zero-egress environments never touch the network unless called.
"""

from __future__ import annotations


def download_file_from_google_drive(file_id: str, destination: str,
                                    chunk_size: int = 32768) -> None:
    import requests

    url = "https://docs.google.com/uc?export=download"
    session = requests.Session()
    response = session.get(url, params={"id": file_id}, stream=True)

    token = None
    for key, value in response.cookies.items():
        if key.startswith("download_warning"):
            token = value
    if token:
        response = session.get(url, params={"id": file_id, "confirm": token}, stream=True)

    with open(destination, "wb") as f:
        for chunk in response.iter_content(chunk_size):
            if chunk:
                f.write(chunk)
