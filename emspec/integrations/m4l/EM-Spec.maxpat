{
	"patcher": {
		"fileversion": 1,
		"appversion": {
			"major": 8,
			"minor": 5,
			"revision": 0,
			"architecture": "x64",
			"modernui": 1
		},
		"classnamespace": "box",
		"rect": [100.0, 100.0, 520.0, 300.0],
		"bglocked": 0,
		"openinpresentation": 1,
		"default_fontsize": 12.0,
		"default_fontface": 0,
		"default_fontname": "Arial",
		"gridonopen": 1,
		"gridsize": [15.0, 15.0],
		"gridsnaponopen": 1,
		"objectsnaponopen": 1,
		"statusbarvisible": 2,
		"toolbarvisible": 1,
		"boxes": [
			{
				"box": {
					"id": "obj-1",
					"maxclass": "comment",
					"numinlets": 1,
					"numoutlets": 0,
					"patching_rect": [15.0, 10.0, 300.0, 20.0],
					"presentation": 1,
					"presentation_rect": [5.0, 2.0, 160.0, 20.0],
					"text": "EM-Spec Info View sync"
				}
			},
			{
				"box": {
					"id": "obj-2",
					"maxclass": "newobj",
					"numinlets": 2,
					"numoutlets": 1,
					"outlettype": ["bang"],
					"patching_rect": [15.0, 70.0, 80.0, 22.0],
					"text": "metro 250"
				}
			},
			{
				"box": {
					"id": "obj-3",
					"maxclass": "newobj",
					"numinlets": 1,
					"numoutlets": 1,
					"outlettype": ["bang"],
					"patching_rect": [15.0, 40.0, 70.0, 22.0],
					"text": "loadbang"
				}
			},
			{
				"box": {
					"id": "obj-4",
					"maxclass": "message",
					"numinlets": 2,
					"numoutlets": 1,
					"outlettype": [""],
					"patching_rect": [95.0, 40.0, 30.0, 22.0],
					"text": "1"
				}
			},
			{
				"box": {
					"id": "obj-5",
					"maxclass": "newobj",
					"numinlets": 1,
					"numoutlets": 1,
					"outlettype": [""],
					"patching_rect": [15.0, 130.0, 120.0, 22.0],
					"saved_object_attributes": {
						"filename": "emspec_state.js",
						"parameter_enable": 0
					},
					"text": "js emspec_state.js"
				}
			},
			{
				"box": {
					"id": "obj-6",
					"maxclass": "live.toggle",
					"numinlets": 1,
					"numoutlets": 1,
					"outlettype": [""],
					"parameter_enable": 1,
					"patching_rect": [160.0, 40.0, 15.0, 15.0],
					"presentation": 1,
					"presentation_rect": [5.0, 28.0, 15.0, 15.0],
					"saved_attribute_attributes": {
						"valueof": {
							"parameter_enum": ["Mac", "PC"],
							"parameter_longname": "PC / Mac",
							"parameter_mmax": 1,
							"parameter_shortname": "PC/Mac",
							"parameter_type": 2
						}
					},
					"varname": "pc_toggle"
				}
			},
			{
				"box": {
					"id": "obj-7",
					"maxclass": "newobj",
					"numinlets": 1,
					"numoutlets": 1,
					"outlettype": [""],
					"patching_rect": [160.0, 70.0, 110.0, 22.0],
					"text": "prepend platform"
				}
			},
			{
				"box": {
					"id": "obj-8",
					"maxclass": "textedit",
					"numinlets": 1,
					"numoutlets": 4,
					"outlettype": ["", "int", "", ""],
					"parameter_enable": 0,
					"patching_rect": [290.0, 40.0, 120.0, 22.0],
					"presentation": 1,
					"presentation_rect": [30.0, 26.0, 100.0, 20.0],
					"text": "username",
					"varname": "username_field"
				}
			},
			{
				"box": {
					"id": "obj-9",
					"maxclass": "newobj",
					"numinlets": 1,
					"numoutlets": 1,
					"outlettype": [""],
					"patching_rect": [290.0, 70.0, 115.0, 22.0],
					"text": "prepend username"
				}
			},
			{
				"box": {
					"id": "obj-10",
					"maxclass": "newobj",
					"numinlets": 1,
					"numoutlets": 1,
					"outlettype": [""],
					"patching_rect": [15.0, 170.0, 80.0, 22.0],
					"text": "prepend set"
				}
			},
			{
				"box": {
					"id": "obj-11",
					"maxclass": "comment",
					"numinlets": 1,
					"numoutlets": 0,
					"patching_rect": [15.0, 200.0, 300.0, 20.0],
					"presentation": 1,
					"presentation_rect": [5.0, 48.0, 160.0, 18.0],
					"text": "Monitoring On",
					"varname": "status_comment"
				}
			}
		],
		"lines": [
			{ "patchline": { "source": ["obj-3", 0], "destination": ["obj-4", 0] } },
			{ "patchline": { "source": ["obj-4", 0], "destination": ["obj-2", 0] } },
			{ "patchline": { "source": ["obj-2", 0], "destination": ["obj-5", 0] } },
			{ "patchline": { "source": ["obj-6", 0], "destination": ["obj-7", 0] } },
			{ "patchline": { "source": ["obj-7", 0], "destination": ["obj-5", 0] } },
			{ "patchline": { "source": ["obj-8", 0], "destination": ["obj-9", 0] } },
			{ "patchline": { "source": ["obj-9", 0], "destination": ["obj-5", 0] } },
			{ "patchline": { "source": ["obj-5", 0], "destination": ["obj-10", 0] } },
			{ "patchline": { "source": ["obj-10", 0], "destination": ["obj-11", 0] } }
		],
		"dependency_cache": [
			{
				"name": "emspec_state.js",
				"bootpath": ".",
				"patcherrelativepath": ".",
				"type": "TEXT",
				"implicit": 1
			}
		],
		"autosave": 0
	}
}
