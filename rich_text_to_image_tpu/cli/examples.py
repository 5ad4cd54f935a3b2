"""Example rich-text documents (demo banks for CLI/gradio, golden demos).

Fresh example set exercising every attribute class the framework supports
(the reference caches similar example banks in its gradio apps as de-facto
golden outputs, SURVEY §4.5).
"""

EXAMPLES: dict[str, dict] = {
    "footnote-cat": {
        "ops": [
            {"insert": "A close-up 4k dslr photo of a "},
            {"attributes": {"link": "A cat wearing sunglasses and a bandana "
                                    "around its neck."},
             "insert": "cat"},
            {"insert": " riding a scooter. There are palm trees in the "
                       "background."},
        ]
    },
    "color-church": {
        "ops": [
            {"insert": "a "},
            {"attributes": {"color": "#04a704"}, "insert": "church"},
            {"insert": " with beautiful landscape in the background"},
        ]
    },
    "style-two-regions": {
        "ops": [
            {"insert": "a "},
            {"attributes": {"font": "mirza"}, "insert": "garden"},
            {"insert": " with a "},
            {"attributes": {"font": "slabo"}, "insert": "mountain"},
            {"insert": " in the distance"},
        ]
    },
    "size-reweighting": {
        "ops": [
            {"insert": "a pizza with "},
            {"attributes": {"size": "60px"}, "insert": "pineapples"},
            {"insert": ", pepperonis, and mushrooms on the top, 4k, "
                       "photorealistic"},
        ]
    },
    "strike-negation": {
        "ops": [
            {"insert": "a garden with "},
            {"attributes": {"size": "30px", "strike": True},
             "insert": "roses"},
            {"insert": " and tulips"},
        ]
    },
    "everything": {
        "ops": [
            {"insert": "a "},
            {"attributes": {"font": "ubuntu"}, "insert": "castle"},
            {"insert": " beside a "},
            {"attributes": {"color": "#0000ff",
                            "link": "A crystal-clear alpine lake with lily "
                                    "pads."},
             "insert": "lake"},
            {"insert": " under a "},
            {"attributes": {"size": "50px"}, "insert": "dramatic"},
            {"insert": " sky"},
        ]
    },
}
