classdef test_net < matlab.unittest.TestCase
  % Net facade tests. Scenario parity with the reference matcaffe suite;
  % the same scenarios also run MATLAB-free at the gateway and MEX layers
  % (tests/test_matlab_binding.py, tests/test_matlab_mex.py).

  properties
    num_output
    net
  end

  methods (Static)
    function model_file = simple_net_file(num_output)
      % DummyData(gaussian data + fill-once constant label) -> conv -> ip
      % -> softmax loss, with force_backward so input diffs materialise
      model_file = tempname();
      fid = fopen(model_file, 'w');
      fprintf(fid, strjoin({ ...
        'name: "testnet" force_backward: true', ...
        'layer { type: "DummyData" name: "data" top: "data" top: "label"', ...
        '  dummy_data_param { num: 5 channels: 2 height: 3 width: 4', ...
        '    num: 5 channels: 1 height: 1 width: 1', ...
        '    data_filler { type: "gaussian" std: 1 }', ...
        '    data_filler { type: "constant" } } }', ...
        'layer { type: "Convolution" name: "conv" bottom: "data" top: "conv"', ...
        '  convolution_param { num_output: 11 kernel_size: 2 pad: 3', ...
        '    weight_filler { type: "gaussian" std: 1 }', ...
        '    bias_filler { type: "constant" value: 2 } }', ...
        '  param { decay_mult: 1 } param { decay_mult: 0 } }', ...
        sprintf(['layer { type: "InnerProduct" name: "ip" bottom: "conv" ' ...
        'top: "ip"\n  inner_product_param { num_output: %d'], num_output), ...
        '    weight_filler { type: "gaussian" std: 2.5 }', ...
        '    bias_filler { type: "constant" value: -3 } } }', ...
        'layer { type: "SoftmaxWithLoss" name: "loss" bottom: "ip"', ...
        '  bottom: "label" top: "loss" }'}, sprintf('\n')));
      fclose(fid);
    end
  end

  methods
    function self = test_net()
      self.num_output = 13;
      model_file = caffe.test.test_net.simple_net_file(self.num_output);
      self.net = caffe.Net(model_file, 'train');
      caffe.get_net(model_file, 'train');  % factory path must also work
      self.net.blobs('label').set_data(randi( ...
        self.num_output - 1, self.net.blobs('label').shape));
      delete(model_file);
    end
  end

  methods (Test)
    function self = test_blob(self)
      d = self.net.blobs('data');
      d.set_data(10 * ones(d.shape));
      self.verifyEqual(d.get_data(), 10 * ones(d.shape, 'single'));
      d.set_diff(-2 * ones(d.shape));
      self.verifyEqual(d.get_diff(), -2 * ones(d.shape, 'single'));
      original_shape = d.shape;
      d.reshape([6 5 4 3 2 1]);
      self.verifyEqual(d.shape, [6 5 4 3 2 1]);
      d.reshape(original_shape);
      self.net.reshape();
    end

    function self = test_layer(self)
      self.verifyEqual(self.net.params('conv', 1).shape, [2 2 2 11]);
      self.verifyEqual(self.net.layers('conv').params(2).shape, 11);
      self.verifyEqual(self.net.layers('conv').type(), 'Convolution');
    end

    function test_forward_backward(self)
      self.net.forward_prefilled();
      self.net.backward_prefilled();
    end

    function test_inputs_outputs(self)
      self.verifyEqual(self.net.inputs, cell(0, 1))
      self.verifyEqual(self.net.outputs, {'loss'});
    end

    function test_save_and_read(self)
      weights_file = tempname();
      self.net.save(weights_file);
      model_file2 = caffe.test.test_net.simple_net_file(self.num_output);
      net2 = caffe.Net(model_file2, 'train');
      net2.copy_from(weights_file);
      net3 = caffe.Net(model_file2, weights_file, 'train');
      delete(model_file2);
      delete(weights_file);
      for l = 1:numel(self.net.layer_vec)
        for i = 1:numel(self.net.layer_vec(l).params)
          want = self.net.layer_vec(l).params(i).get_data();
          self.verifyEqual(want, net2.layer_vec(l).params(i).get_data());
          self.verifyEqual(want, net3.layer_vec(l).params(i).get_data());
        end
      end
    end
  end
end
